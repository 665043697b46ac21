"""Pin the kernel-vs-distributed extraction gap (VERDICT r4 #3).

The question: the serial extractor kernel measures ~4.0k docs/s/core, but
the distributed headline runs ~1.9-2.3k docs/s per PROBED effective core.
Where does the ~2x go — probe bias (the spin probe overstates the capacity
available to a memory-heavy workload) or real framework overhead (task
scheduling, block serialization, idle workers)?

Protocol (each phase a fresh process owning its Ray session):

* ``--phase serial``: single process, NO Ray — the extraction kernel run
  directly over bench-corpus batches.  The unloaded kernel rate, today, on
  today's corpus bytes.
* ``--phase dist --cpus K``: the headline pipeline (sniff -> skew split ->
  extract) with the extract UDF wrapped to charge each batch's in-worker
  wall to its rows (``udf_sec`` column, per-row share; Sum = total busy
  UDF-seconds).  Reports:
    - ``in_worker_rate``  = docs / udf_sec_total   (kernel rate UNDER LOAD)
    - ``busy_cores``      = udf_sec_total / wall   (avg extract-busy cores)
    - ``eff_cores``       = adjacent spin probes   (the bench's capacity
      metric, for the same window)
  Decomposition: docs/s = in_worker_rate x busy_cores.  If in_worker_rate
  collapses below the serial rate while busy_cores ~= probed capacity, the
  gap is IN-KERNEL contention (memory bandwidth / SMT / hypervisor) that a
  register-bound spin probe cannot see; if in_worker_rate holds at ~serial
  and busy_cores lags the probe, the gap is scheduling/serialization.

Run everything:  python scripts/profile_extract_gap.py
Findings land in BASELINE.md (round-5 perf notes).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("GRAFT_GAP_REPLICATE", "60"))


def _corpus() -> str:
    """Reuse bench.py's materialized corpus (cached by _DONE marker)."""
    import ray

    import bench
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    d = bench.bench_corpus(SF_DIR, REPLICATE)
    ray.shutdown()
    return d


def phase_serial(corpus: str, n_docs: int) -> None:
    """Unloaded single-core kernel rate over the real corpus bytes."""
    import pyarrow.dataset as pads

    from org_dharts_dia_tesseract_ray.stages.extractor import HtmlExtractor
    from org_dharts_dia_tesseract_ray.stages.sniff import sniff_batch

    files = []
    for root, _, fns in os.walk(corpus):
        files += [os.path.join(root, f) for f in fns
                  if f.endswith(".parquet")]
    t = pads.dataset(sorted(files)[:8], format="parquet").head(n_docs)
    ex = HtmlExtractor()
    # warmup pass compiles regexes / warms caches
    ex(sniff_batch(t.slice(0, 256)))
    t0 = time.perf_counter()
    done = 0
    out_blocks = 0
    for i in range(0, t.num_rows, 128):
        b = t.slice(i, 128)
        out = ex(sniff_batch(b))
        done += out.num_rows
        out_blocks += out.num_rows
    wall = time.perf_counter() - t0
    print(json.dumps({"phase": "serial", "docs": done,
                      "wall_sec": round(wall, 3),
                      "docs_per_sec_core": round(done / wall, 1)}))


def phase_dist(corpus: str, cpus: int, blocks: int | None = None) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    from ray.data.aggregate import Count, Sum

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    from ray import cloudpickle as rcp

    import org_dharts_dia_tesseract_ray as pkg
    rcp.register_pickle_by_value(pkg)

    import bench
    from org_dharts_dia_tesseract_ray.pipelines import extract_pipeline as ep
    from org_dharts_dia_tesseract_ray.stages.extractor import make_extract_fn
    from org_dharts_dia_tesseract_ray.stages.sniff import apply_sniff

    inner = make_extract_fn(None)

    def timed_extract(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        out = inner(batch)
        dt = time.perf_counter() - t0
        n = out.num_rows
        share = dt / n if n else 0.0
        return out.append_column(
            "udf_sec", pa.array([share] * n, pa.float64()))

    def split_by_size(t):
        mask = pc.less_equal(t["payload_bytes"], ep.OVERSIZED_BYTES)
        small, big = t.filter(mask), t.filter(pc.invert(mask))
        for i in range(0, small.num_rows, 128):
            yield small.slice(i, 128)
        for i in range(big.num_rows):
            yield big.slice(i, 1)

    def read():
        if blocks is None:
            return bench.read_bench_pages(corpus)
        return ray.data.read_parquet(
            corpus, columns=["url", "warc_ts", "html", "text", "lang"],
            override_num_blocks=blocks)

    def pipeline():
        ds = apply_sniff(read())
        ds = ds.map_batches(split_by_size, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
        ds = ds.map_batches(timed_extract, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)
        return (ds.select_columns(["payload_bytes", "udf_sec"])
                .aggregate(Count(on="payload_bytes", alias_name="docs"),
                           Sum("payload_bytes", alias_name="bytes"),
                           Sum("udf_sec", alias_name="udf_sec")))

    pipeline()  # warmup (worker spawn, imports, page cache)
    eff_before = bench.probe_effective_cores()
    t0 = time.perf_counter()
    stats = pipeline()
    wall = time.perf_counter() - t0
    eff_after = bench.probe_effective_cores()

    docs = int(stats["docs"])
    udf = float(stats["udf_sec"])
    print(json.dumps({
        "phase": "dist", "cpus": cpus, "blocks": blocks, "docs": docs,
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(docs / wall, 1),
        "udf_sec_total": round(udf, 2),
        "in_worker_rate": round(docs / udf, 1),
        "busy_cores": round(udf / wall, 1),
        "eff_cores_before": eff_before,
        "eff_cores_after": eff_after,
    }))
    ray.shutdown()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["serial", "dist"], default=None)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--blocks", type=int, default=None)
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--serial-docs", type=int, default=40_000)
    args = ap.parse_args()

    if args.phase == "serial":
        phase_serial(args.corpus, args.serial_docs)
        return 0
    if args.phase == "dist":
        phase_dist(args.corpus, args.cpus, args.blocks)
        return 0

    corpus = _corpus()
    me = os.path.abspath(__file__)
    results = []
    for cmd in ([sys.executable, me, "--phase", "serial",
                 "--corpus", corpus],
                [sys.executable, me, "--phase", "dist", "--cpus", "32",
                 "--corpus", corpus],
                [sys.executable, me, "--phase", "dist", "--cpus", "8",
                 "--corpus", corpus]):
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
        if r.returncode != 0:
            print(r.stderr[-2000:], file=sys.stderr)
            return 1
        line = r.stdout.strip().splitlines()[-1]
        print(line)
        results.append(json.loads(line))
    with open("/tmp/extract_gap.json", "w") as f:
        json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
