"""Multimodal (image/audio/video) columns — typed binary payloads + actor-pool
decode/feature stages.

Mirrors the reference's image-ingest surface (``ImageIOHelper`` decoding
PNG/TIFF/JPEG → pixel buffers, /root/reference/src/.../ImageIOHelper.java:270-327
and ``convertImageData`` :249-257) for a corpus where media are opaque
``binary`` columns with typed metadata.

The image/audio codec libraries are NOT in this container, so the codec call
itself is stubbed (clearly marked, import-gated) behind a deterministic fake —
but all the Ray-side plumbing is real and tested: schema, actor signature,
batch sizing for large binary payloads, zero-copy flow, flat_map frame
expansion, feature-vector output layout.

Scale notes: media rows are WIDE (MBs) — stages below default to small
``batch_size`` so batch × concurrency fits worker heaps, and drop the payload
column on output exactly like the extract stage drops ``html``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),            # "image" | "audio" | "video"
    ("payload", pa.binary()),         # opaque encoded media bytes
    ("width", pa.int32()),            # typed metadata travels beside payload
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])

FEATURE_DIM = 16

_MAGIC = b"SYNM"                      # synthetic media container magic


def synth_media_table(n: int, *, kind: str = "image",
                      seed: int = 42) -> pa.Table:
    """Deterministic synthetic media corpus for tests/benches.

    Payload = 16-byte header (magic, width, height, n_frames) + content bytes
    derived from blake2b(item_id, seed) — stable across runs and machines.
    """
    ids, kinds, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = 32 + (i * 7) % 96
        h = 24 + (i * 5) % 72
        nf = 1 if kind == "image" else 8 + i % 24
        body = hashlib.blake2b(f"{seed}:{kind}:{i}".encode(),
                               digest_size=64).digest() * 4
        payload = _MAGIC + struct.pack("<iii", w, h, nf) + body
        ids.append(i)
        kinds.append(kind)
        payloads.append(payload)
        ws.append(w)
        hs.append(h)
        fs.append(nf)
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(fs, pa.int32()),
    })


def _decode_header(payload: bytes) -> tuple[int, int, int] | None:
    if payload[:4] != _MAGIC or len(payload) < 16:
        return None
    return struct.unpack("<iii", payload[4:16])


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real feature extractor: blake2b bytes →
    FEATURE_DIM float32 in [0, 1)."""
    d = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    u = np.frombuffer(d, dtype=np.uint32).astype(np.float64)
    return (u / 2**32).astype(np.float32)


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` loads the codec once per actor (the TessBaseAPI-init
    analogue, TesseractHandle.java:380-459).  With no codec library in the
    environment it registers the deterministic fake; the real branch raises
    ``NotImplementedError`` where the codec call would go — the STUB point.
    """

    def __init__(self, *, strict_codec: bool = False):
        self.strict = strict_codec
        try:                                   # import-gated real codec path
            import PIL.Image as _pil           # noqa: F401
            self._pil = _pil
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes, kind: str):
        if self._pil is not None and payload[:4] != _MAGIC:
            # real-codec branch (import-gated): decode with PIL when it is
            # available and the payload is actual encoded media
            import io
            try:
                img = self._pil.open(io.BytesIO(payload))
                w, h = img.size
                nf = int(getattr(img, "n_frames", 1))
                # deterministic features: 8×8 grayscale thumbnail bytes
                thumb = img.convert("L").resize((8, 8))
                raw = thumb.tobytes()
                u = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                feats = np.zeros(FEATURE_DIM, dtype=np.float32)
                feats[:min(FEATURE_DIM, len(u) // 4)] = (
                    u[:min(FEATURE_DIM, len(u) // 4) * 4]
                    .reshape(-1, 4).mean(axis=1) / 255.0)
                return (w, h, nf), feats
            except Exception:
                return None
        if self.strict:
            raise NotImplementedError("codec library unavailable (stub)")
        hdr = _decode_header(payload)
        if hdr is None:
            return None
        return hdr, _fake_features(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["item_id"]
        feats = np.zeros((batch.num_rows, FEATURE_DIM), dtype=np.float32)
        ok, ws, hs, fs = [], [], [], []
        kinds = batch["kind"].to_pylist()
        for i, payload in enumerate(batch["payload"].to_pylist()):
            res = self._decode(payload or b"", kinds[i])
            if res is None:
                ok.append("decode_error")
                ws.append(0); hs.append(0); fs.append(0)
            else:
                (w, h, nf), f = res
                feats[i] = f
                ok.append("ok")
                ws.append(w); hs.append(h); fs.append(nf)
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(
            np.arange(batch.num_rows + 1, dtype=np.int32) * FEATURE_DIM)
        # payload column dropped on output — downstream blocks shrink
        return pa.table({
            "item_id": ids,
            "status": pa.array(ok, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(fs, pa.int32()),
            "features": pa.ListArray.from_arrays(offsets, flat),
        })


def apply_decode(ds, *, batch_size: int = 16, concurrency=(1, 8)):
    """Small batches: media payloads are wide rows (SURVEY.md §4 memory)."""
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)


def frame_sample_batch(batch: pa.Table, *, every: int = 4) -> pa.Table:
    """Video frame sampling as a vectorized row expansion: one output row per
    sampled frame index (real frame decode = the stubbed codec call)."""
    ids = np.asarray(batch["item_id"], dtype=np.int64)
    nf = np.asarray(batch["n_frames"], dtype=np.int64)
    counts = (nf + every - 1) // every
    rep_ids = np.repeat(ids, counts)
    frame_idx = np.concatenate([
        np.arange(0, int(n), every, dtype=np.int64) for n in nf
    ]) if len(nf) else np.array([], dtype=np.int64)
    return pa.table({
        "item_id": pa.array(rep_ids, pa.int64()),
        "frame_idx": pa.array(frame_idx, pa.int64()),
    })


def apply_frame_sample(ds, *, every: int = 4):
    return ds.map_batches(lambda b: frame_sample_batch(b, every=every),
                          batch_format="pyarrow", zero_copy_batch=True)
