"""Multi-node simulation — the north rule's `ray job submit` shape on one box.

Everything before this script ran `ray.init(address="local")`: one raylet,
one object store, no inter-node object transfer.  The north rule demands the
pipeline run via ``ray job submit`` on a fixed multi-node cluster, and the
exchange layer (plasma object transfer between raylets, distributed shuffle,
spilling) is exactly what single-node mode never exercises.  This script
stands up a REAL multi-raylet cluster on this box — ``ray start --head``
plus two worker raylets, each with its own object store and a partitioned
CPU slice — and proves:

1. the checkpointed extraction job (``org_dharts_dia_tesseract_ray.job``)
   runs end-to-end on the cluster, submitted via ``ray job submit`` when the
   job server comes up (falls back to a direct ``address="auto"`` driver —
   same raylet/GCS execution path, only the submission plumbing differs);
2. its output is BYTE-IDENTICAL to the single-node run on the same input
   (every column of the combined view and the spans view, keyed by url);
3. two shuffle-heavy relational queries — MinHash+LSH near-dup (banded
   self-join) and the schema-pinned right-outer join — produce value-
   identical results through the multi-node exchange.

Usage (orchestrates everything, ~2-4 min):

    python scripts/multinode_sim.py [--sf-dir /root/testdata/sf0.01]

Writes a one-line JSON verdict to stdout and MULTINODE.json next to the
corpus.  Internal phases run as fresh subprocesses so each owns its Ray
session (`--phase` flag); the daemons get PYTHONPATH=/root/repo so worker
processes on every raylet can import the package by reference.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORK = "/tmp/graft_multinode"
HEAD_PORT = 6379

# CPU partition: 3 raylets × 8 CPUs = 24 of the box's 32, leaving headroom
# for the driver + GCS.  Three object stores, explicitly sized small so the
# extraction output and shuffle blocks MUST move between raylets rather
# than fit in one store.
NODES = [("head", 8), ("worker1", 8), ("worker2", 8)]
OBJ_STORE_BYTES = 1 << 30  # 1 GiB per raylet


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["RAY_DISABLE_USAGE_STATS"] = "1"
    env.pop("RAY_ADDRESS", None)  # the sandbox presets RAY_ADDRESS=local
    return env


def _run(cmd, **kw):
    kw.setdefault("env", _env())
    kw.setdefault("cwd", REPO)
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


# ---------------------------------------------------------------- phases
def phase_build(sf_dir: str) -> None:
    """Materialize the pages corpus ONCE; both topologies read these bytes."""
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, REPO)
    import bench
    built = bench.bench_corpus(sf_dir, replicate=1, files=16)
    ray.shutdown()
    print(json.dumps({"corpus": built}))


def phase_queries(sf_dir: str, out_dir: str, address: str) -> None:
    """Run the two shuffle-heavy queries and persist results as parquet."""
    import ray
    ray.init(address=address, include_dashboard=False,
             logging_level="ERROR",
             **({"num_cpus": 8} if address == "local" else {}))
    sys.path.insert(0, REPO)
    import importlib
    entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data
    for name in ("neardup_minhash_lsh", "urgent_spend_right_customer"):
        res = qs[name](sf_dir)
        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        if isinstance(res, pd.DataFrame):
            t = pa.Table.from_pandas(res, preserve_index=False)
        else:
            assert isinstance(res, pa.Table)
            t = res
        pq.write_table(t, os.path.join(out_dir, f"{name}.parquet"))
    ray.shutdown()
    print(json.dumps({"queries_out": out_dir}))


# ------------------------------------------------------------ comparison
def _read_sorted(dirs, key_cols):
    import pyarrow.dataset as pads
    files = []
    for d in dirs:
        for root, _, fns in os.walk(d):
            files += [os.path.join(root, f) for f in fns
                      if f.endswith(".parquet")]
    t = pads.dataset(sorted(files), format="parquet").to_table()
    return t.sort_by([(k, "ascending") for k in key_cols])


def _part_dirs(root: str):
    return sorted(os.path.join(root, d) for d in os.listdir(root)
                  if d.startswith("part="))


def compare_outputs(single: str, multi: str) -> dict:
    """Byte-identity check: every column equal after sort-by-key.

    Job layout: ``out/part=NNNNN/`` (combined view) plus
    ``out/spans/part=NNNNN/`` (exploded span records)."""
    report = {}
    for view, keys in (
            ("combined", ["url"]),
            ("spans", ["url", "node_id", "start", "level"])):
        sd = single if view == "combined" else os.path.join(single, "spans")
        md = multi if view == "combined" else os.path.join(multi, "spans")
        a = _read_sorted(_part_dirs(sd), keys)
        b = _read_sorted(_part_dirs(md), keys)
        if sorted(a.column_names) != sorted(b.column_names):
            report[view] = {"identical": False,
                            "why": f"schema {a.column_names} vs "
                                   f"{b.column_names}"}
            continue
        b = b.select(a.column_names)
        bad = [c for c in a.column_names
               if not a[c].combine_chunks().equals(b[c].combine_chunks())]
        report[view] = {"rows": a.num_rows, "identical": a.num_rows ==
                        b.num_rows and not bad, "mismatched_cols": bad}
    return report


def compare_queries(single: str, multi: str) -> dict:
    import pyarrow.parquet as pq
    report = {}
    for name in ("neardup_minhash_lsh", "urgent_spend_right_customer"):
        a = pq.read_table(os.path.join(single, f"{name}.parquet"))
        b = pq.read_table(os.path.join(multi, f"{name}.parquet"))
        keys = [(c, "ascending") for c in a.column_names]
        a, b = a.sort_by(keys), b.select(a.column_names).sort_by(keys)
        report[name] = {"rows": a.num_rows, "identical": a.equals(b)}
    return report


# ---------------------------------------------------------- orchestrator
def start_cluster() -> dict:
    _run(["ray", "stop", "--force"])
    time.sleep(2)
    info = {"nodes": []}
    head_cpus = NODES[0][1]
    r = _run(["ray", "start", "--head", f"--port={HEAD_PORT}",
              f"--num-cpus={head_cpus}",
              f"--object-store-memory={OBJ_STORE_BYTES}"])
    if r.returncode != 0:
        raise RuntimeError(f"head failed: {r.stderr[-2000:]}")
    info["nodes"].append({"role": "head", "cpus": head_cpus})
    for name, cpus in NODES[1:]:
        r = _run(["ray", "start", f"--address=127.0.0.1:{HEAD_PORT}",
                  f"--num-cpus={cpus}",
                  f"--object-store-memory={OBJ_STORE_BYTES}"])
        if r.returncode != 0:
            raise RuntimeError(f"{name} failed: {r.stderr[-2000:]}")
        info["nodes"].append({"role": name, "cpus": cpus})
    # wait until GCS reports all raylets alive
    deadline = time.time() + 60
    while time.time() < deadline:
        r = _run(["ray", "status"])
        if r.stdout.count("node_") >= len(NODES):
            info["status"] = r.stdout
            return info
        time.sleep(2)
    raise RuntimeError("cluster did not reach %d nodes" % len(NODES))


def try_job_submit(corpus: str, out: str) -> tuple[bool, str]:
    """North-rule submission path; needs the head's job server (dashboard
    agent).  Returns (used_job_submit, log_tail)."""
    r = _run(["ray", "job", "submit", "--working-dir", REPO,
              "--address", "http://127.0.0.1:8265", "--",
              "python", "-m", "org_dharts_dia_tesseract_ray.job",
              "--input", corpus, "--out", out, "--files-per-shard", "4"],
             timeout=600)
    ok = r.returncode == 0 and os.path.isdir(os.path.join(out, "combined"))
    return ok, (r.stdout + r.stderr)[-3000:]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--phase", choices=["build", "queries"], default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--address", default="local")
    args = ap.parse_args(argv)

    if args.phase == "build":
        phase_build(args.sf_dir)
        return 0
    if args.phase == "queries":
        phase_queries(args.sf_dir, args.out, args.address)
        return 0

    os.makedirs(WORK, exist_ok=True)
    summary = {"work_dir": WORK, "sf_dir": args.sf_dir,
               "topology": [{"role": n, "cpus": c} for n, c in NODES]}
    me = os.path.abspath(__file__)

    def sub(desc, cmd, timeout=900):
        t0 = time.time()
        r = _run(cmd, timeout=timeout)
        if r.returncode != 0:
            print(r.stdout[-2000:], file=sys.stderr)
            print(r.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"{desc} failed rc={r.returncode}")
        summary.setdefault("wall", {})[desc] = round(time.time() - t0, 1)
        return r

    try:
        # corpus (idempotent — bench_corpus caches by _DONE marker)
        r = sub("build", [sys.executable, me, "--phase", "build",
                          "--sf-dir", args.sf_dir])
        corpus = json.loads(r.stdout.strip().splitlines()[-1])["corpus"]
        summary["corpus"] = corpus

        # single-node reference run
        single_out = os.path.join(WORK, "job_single")
        import shutil
        for d in ("job_single", "job_multi", "q_single", "q_multi"):
            shutil.rmtree(os.path.join(WORK, d), ignore_errors=True)
        sub("job_single",
            [sys.executable, "-m", "org_dharts_dia_tesseract_ray.job",
             "--local", "--input", corpus, "--out", single_out,
             "--files-per-shard", "4"])
        sub("queries_single",
            [sys.executable, me, "--phase", "queries", "--sf-dir",
             args.sf_dir, "--out", os.path.join(WORK, "q_single"),
             "--address", "local"])

        # multi-node cluster
        cl = start_cluster()
        summary["cluster_nodes"] = len(cl["nodes"])

        multi_out = os.path.join(WORK, "job_multi")
        used_submit, log = try_job_submit(corpus, multi_out)
        summary["ray_job_submit"] = used_submit
        if not used_submit:
            summary["ray_job_submit_log"] = log[-800:]
            sub("job_multi_driver",
                [sys.executable, "-m", "org_dharts_dia_tesseract_ray.job",
                 "--input", corpus, "--out", multi_out,
                 "--files-per-shard", "4"])
        else:
            summary["wall"]["job_multi_submit"] = None
        sub("queries_multi",
            [sys.executable, me, "--phase", "queries", "--sf-dir",
             args.sf_dir, "--out", os.path.join(WORK, "q_multi"),
             "--address", "auto"])

        summary["job_identity"] = compare_outputs(single_out, multi_out)
        summary["query_identity"] = compare_queries(
            os.path.join(WORK, "q_single"), os.path.join(WORK, "q_multi"))
        ok = (all(v.get("identical") for v in summary["job_identity"]
                  .values())
              and all(v.get("identical") for v in summary["query_identity"]
                      .values()))
        summary["verdict"] = "IDENTICAL" if ok else "MISMATCH"
    finally:
        _run(["ray", "stop", "--force"])

    with open(os.path.join(WORK, "MULTINODE.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    return 0 if summary.get("verdict") == "IDENTICAL" else 1


if __name__ == "__main__":
    sys.exit(main())
