"""Multimodal (image/audio/video) columns — typed binary payloads + actor-pool
decode/feature stages.

Mirrors the reference's image-ingest surface (``ImageIOHelper`` decoding
PNG/TIFF/JPEG → pixel buffers, /root/reference/src/.../ImageIOHelper.java:270-327
and ``convertImageData`` :249-257) for a corpus where media are opaque
``binary`` columns with typed metadata.

The container codec libraries (PIL/ffmpeg) are NOT in this environment, so
media travel in **SYNM v2**, a real (if minimal) deterministic container
format this module both encodes and decodes in pure Python/numpy:

    offset 0   magic   b"SYNM"
           4   version uint8  (= 2)
           5   kind    uint8  (0 image, 1 audio, 2 video)
           6   width   uint16 LE
           8   height  uint16 LE
          10   n_frames uint16 LE
          12   per frame: rle_len uint32 LE, then RLE runs of
               (count uint16 LE, value uint8) over the frame's raw
               8-bit pixels (row-major)
         end   crc32   uint32 LE over ALL raw pixel bytes concatenated

Decoding is real work: header parse, per-frame RLE decompression
(``np.repeat`` — vectorized), whole-container CRC32 validation, and a 4×4
tile-mean feature vector (the resize/feature-extract step) computed from the
DECODED pixels.  Corrupt payloads (bad magic, truncation, bit flips) yield
``status="decode_error"`` rows — never exceptions (never-throw-per-row,
reference error-row contract).  A genuine PIL branch remains import-gated
for real encoded images when the library exists.

Scale notes: media rows are WIDE (MBs) — stages below default to small
``batch_size`` so batch × concurrency fits worker heaps, and drop the payload
column on output exactly like the extract stage drops ``html``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("item_id", pa.int64()),
    ("kind", pa.string()),            # "image" | "audio" | "video"
    ("payload", pa.binary()),         # SYNM v2 container bytes
    ("width", pa.int32()),            # typed metadata travels beside payload
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
])

FEATURE_DIM = 16

_MAGIC = b"SYNM"
_VERSION = 2
_KINDS = {"image": 0, "audio": 1, "video": 2}


# ---------------------------------------------------------------------------
# SYNM v2 codec (pure Python/numpy, deterministic)

def _frame_pixels(item_id: int, seed: int, frame: int, w: int,
                  h: int) -> np.ndarray:
    """Deterministic 8-bit raster for synthesis: 8×8 constant tiles (so RLE
    actually compresses) whose values depend on (item, seed, frame, tile)."""
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    return (((xs[None, :] >> 3) * 37 + (ys[:, None] >> 3) * 11
             + frame * 7 + item_id * 13 + seed) % 256).astype(np.uint8)


def _rle_encode(raw: np.ndarray) -> bytes:
    """Run-length encode a 1-D uint8 array into (count u16 LE, value u8)
    triples; runs longer than 65535 are split."""
    n = raw.size
    if n == 0:
        return b""
    brk = np.flatnonzero(np.diff(raw)) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [n]))
    counts = (ends - starts).astype(np.int64)
    vals = raw[starts]
    if counts.max() > 0xFFFF:
        rep = (counts + 0xFFFE) // 0xFFFF
        split_vals = np.repeat(vals, rep)
        split_counts = np.full(int(rep.sum()), 0xFFFF, np.int64)
        split_counts[np.cumsum(rep) - 1] = counts - (rep - 1) * 0xFFFF
        vals, counts = split_vals, split_counts
    out = np.empty((len(vals), 3), np.uint8)
    out[:, :2] = counts.astype("<u2")[:, None].view(np.uint8)
    out[:, 2] = vals
    return out.tobytes()


def _rle_decode(buf: memoryview, expected: int) -> np.ndarray | None:
    """Decode RLE triples back to uint8 pixels; None on malformed input."""
    a = np.frombuffer(buf, np.uint8)
    if a.size % 3:
        return None
    a = a.reshape(-1, 3)
    counts = np.ascontiguousarray(a[:, :2]).view("<u2").ravel()
    if int(counts.sum()) != expected:
        return None
    return np.repeat(a[:, 2], counts.astype(np.int64))


def encode_media(item_id: int, kind: str, w: int, h: int, n_frames: int,
                 *, seed: int = 42) -> bytes:
    """Encode the deterministic raster stack for one item as SYNM v2."""
    parts = [_MAGIC, struct.pack("<BBHHH", _VERSION, _KINDS[kind], w, h,
                                 n_frames)]
    crc = 0
    for f in range(n_frames):
        raw = _frame_pixels(item_id, seed, f, w, h).reshape(-1)
        crc = zlib.crc32(raw.tobytes(), crc)
        rle = _rle_encode(raw)
        parts.append(struct.pack("<I", len(rle)))
        parts.append(rle)
    parts.append(struct.pack("<I", crc & 0xFFFFFFFF))
    return b"".join(parts)


def decode_media(payload: bytes) -> tuple[tuple[int, int, int],
                                          list[np.ndarray], int] | None:
    """Full decode: ((w, h, n_frames), [frame arrays h×w], crc32) or None on
    any structural/CRC failure."""
    if len(payload) < 16 or payload[:4] != _MAGIC:
        return None
    ver, _kind, w, h, nf = struct.unpack_from("<BBHHH", payload, 4)
    if ver != _VERSION or w <= 0 or h <= 0 or nf <= 0:
        return None
    mv = memoryview(payload)
    pos = 12
    frames: list[np.ndarray] = []
    crc = 0
    for _ in range(nf):
        if pos + 4 > len(payload) - 4:
            return None
        (rle_len,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if pos + rle_len > len(payload) - 4:
            return None
        raw = _rle_decode(mv[pos:pos + rle_len], w * h)
        if raw is None:
            return None
        pos += rle_len
        crc = zlib.crc32(raw.tobytes(), crc)
        frames.append(raw.reshape(h, w))
    if pos + 4 != len(payload):
        return None
    (want_crc,) = struct.unpack_from("<I", payload, pos)
    if (crc & 0xFFFFFFFF) != want_crc:
        return None
    return (w, h, nf), frames, crc & 0xFFFFFFFF


def seek_frame(payload: bytes, idx: int) -> np.ndarray | None:
    """Decode ONLY frame ``idx`` by walking the per-frame length prefixes —
    container seeking, no full decompress (the frame-sampling fast path)."""
    if len(payload) < 16 or payload[:4] != _MAGIC:
        return None
    ver, _kind, w, h, nf = struct.unpack_from("<BBHHH", payload, 4)
    if ver != _VERSION or not (0 <= idx < nf):
        return None
    mv = memoryview(payload)
    pos = 12
    for f in range(nf):
        if pos + 4 > len(payload) - 4:
            return None
        (rle_len,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if f == idx:
            if pos + rle_len > len(payload) - 4:
                return None
            raw = _rle_decode(mv[pos:pos + rle_len], w * h)
            return None if raw is None else raw.reshape(h, w)
        pos += rle_len
    return None


def _tile_features(frame: np.ndarray) -> np.ndarray:
    """4×4 grid of tile means over the decoded pixels, /255 → FEATURE_DIM
    float32 (the resize-to-thumbnail feature step).  Integer tile sums keep
    the result exactly reproducible across platforms."""
    h, w = frame.shape
    ys = np.linspace(0, h, 5).astype(np.int64)
    xs = np.linspace(0, w, 5).astype(np.int64)
    out = np.empty(FEATURE_DIM, np.float64)
    k = 0
    for i in range(4):
        for j in range(4):
            tile = frame[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            out[k] = (int(tile.astype(np.int64).sum())
                      / max(tile.size, 1)) / 255.0
            k += 1
    return out.astype(np.float32)


def _maybe_corrupt(payload: bytes, i: int, corrupt_every: int) -> bytes:
    """Damage every ``corrupt_every``-th payload, cycling through the three
    failure families the decoder must reject: bad magic, truncation, and a
    body bit-flip (CRC mismatch)."""
    if not corrupt_every or i % corrupt_every != corrupt_every - 1:
        return payload
    mode = (i // corrupt_every) % 3
    if mode == 0:
        return b"JUNK" + payload[4:]
    if mode == 1:
        return payload[:max(8, len(payload) // 2)]
    mid = len(payload) // 2
    return payload[:mid] + bytes([payload[mid] ^ 0xFF]) + payload[mid + 1:]


def synth_media_table(n: int, *, kind: str = "image", seed: int = 42,
                      corrupt_every: int = 0) -> pa.Table:
    """Deterministic synthetic media corpus for tests/benches: real SYNM v2
    payloads (encode → decode round-trips to the exact rasters).

    ``corrupt_every=k`` damages every k-th payload (see
    :func:`_maybe_corrupt`).
    """
    ids, kinds, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = 32 + (i * 7) % 96
        h = 24 + (i * 5) % 72
        nf = 1 if kind == "image" else 8 + i % 24
        payload = _maybe_corrupt(encode_media(i, kind, w, h, nf, seed=seed),
                                 i, corrupt_every)
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


def synth_audio_table(n: int, *, seed: int = 42,
                      corrupt_every: int = 0) -> pa.Table:
    """Deterministic synthetic AUDIO corpus: 1-D PCM-like uint8 sample
    chunks carried in the same SYNM v2 container (kind=audio, height=1,
    width = samples per chunk, n_frames = chunk count) — the audio leg of
    the opaque-binary multimodal contract.  The tile pattern degenerates to
    8-sample constant runs, a step waveform the RLE genuinely compresses.
    """
    ids, kinds, payloads, ws, hs, fs = [], [], [], [], [], []
    for i in range(n):
        w = 256 + (i * 31) % 768            # samples per chunk
        nf = 6 + i % 10                     # chunks
        payload = _maybe_corrupt(
            encode_media(i, "audio", w, 1, nf, seed=seed), i, corrupt_every)
        ids.append(i)
        kinds.append("audio")
        payloads.append(payload)
        ws.append(w)
        hs.append(1)
        fs.append(nf)
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(fs, pa.int32()),
    })


# ---------------------------------------------------------------------------
# Ray stages

class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` probes for codec libraries once per actor (the
    TessBaseAPI-init analogue, TesseractHandle.java:380-459): PIL, when
    present, handles genuine encoded images; SYNM v2 containers decode
    through the pure-Python codec above.  Width/height/n_frames on the
    output come from the DECODED header (CRC-validated), not the metadata
    columns."""

    def __init__(self):
        try:                                   # import-gated real codec path
            import PIL.Image as _pil           # noqa: F401
            self._pil = _pil
        except ImportError:
            self._pil = None

    def _decode(self, payload: bytes):
        if self._pil is not None and payload[:4] != _MAGIC:
            # real-codec branch: decode actual encoded media with PIL
            import io
            try:
                img = self._pil.open(io.BytesIO(payload))
                w, h = img.size
                nf = int(getattr(img, "n_frames", 1))
                frame = np.frombuffer(
                    img.convert("L").tobytes(), np.uint8).reshape(h, w)
                crc = zlib.crc32(frame.tobytes()) & 0xFFFFFFFF
                return (w, h, nf), _tile_features(frame), crc
            except Exception:
                return None
        res = decode_media(payload)
        if res is None:
            return None
        (w, h, nf), frames, crc = res
        return (w, h, nf), _tile_features(frames[0]), crc

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.zeros((batch.num_rows, FEATURE_DIM), dtype=np.float32)
        ok, ws, hs, fs, crcs = [], [], [], [], []
        for i, payload in enumerate(batch["payload"].to_pylist()):
            res = self._decode(payload or b"")
            if res is None:
                ok.append("decode_error")
                ws.append(0); hs.append(0); fs.append(0); crcs.append(-1)
            else:
                (w, h, nf), f, crc = res
                feats[i] = f
                ok.append("ok")
                ws.append(w); hs.append(h); fs.append(nf)
                crcs.append(int(crc))
        flat = pa.array(feats.reshape(-1))
        offsets = pa.array(
            np.arange(batch.num_rows + 1, dtype=np.int32) * FEATURE_DIM)
        # payload column dropped on output — downstream blocks shrink
        return pa.table({
            "item_id": batch["item_id"],
            "status": pa.array(ok, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "n_frames": pa.array(fs, pa.int32()),
            "px_checksum": pa.array(crcs, pa.int64()),
            "features": pa.ListArray.from_arrays(offsets, flat),
        })


def apply_decode(ds, *, batch_size: int = 16, concurrency=(1, 8)):
    """Small batches: media payloads are wide rows (SURVEY.md §4 memory)."""
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency)


def frame_sample_batch(batch: pa.Table, *, every: int = 4) -> pa.Table:
    """Video frame sampling: one output row per sampled frame, with the
    frame actually decoded (length-prefix seek + RLE decompress) and its
    pixel mean emitted.  Undecodable payloads/frames yield null means —
    never exceptions."""
    ids = np.asarray(batch["item_id"], dtype=np.int64)
    nf = np.asarray(batch["n_frames"], dtype=np.int64)
    payloads = batch["payload"].to_pylist()
    rep_ids, frame_idx, means = [], [], []
    for r in range(batch.num_rows):
        payload = payloads[r] or b""
        for fi in range(0, int(nf[r]), every):
            rep_ids.append(ids[r])
            frame_idx.append(fi)
            frame = seek_frame(payload, fi)
            if frame is None:
                means.append(None)
            else:
                # integer sum → exact, platform-independent mean at 6 dp
                s = int(frame.astype(np.int64).sum())
                m = s / frame.size
                means.append(np.floor(m * 1e6 + 0.5) / 1e6)
    return pa.table({
        "item_id": pa.array(rep_ids, pa.int64()),
        "frame_idx": pa.array(frame_idx, pa.int64()),
        "frame_mean": pa.array(means, pa.float64()),
    })


def apply_frame_sample(ds, *, every: int = 4):
    return ds.map_batches(lambda b: frame_sample_batch(b, every=every),
                          batch_format="pyarrow", zero_copy_batch=True)


def resize_frame(frame: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Integer box-downsample of one frame to (out_h, out_w) uint8: mean of
    each source box, floor division — exact and platform-independent (the
    SAME integer-tile discipline as :func:`_tile_features`).

    DOWNSAMPLE-ONLY by contract: a target larger than the source would
    produce empty boxes; callers (resize_batch) reject such frames as
    ``too_small`` rows instead."""
    h, w = frame.shape
    if out_h > h or out_w > w:
        raise ValueError("resize_frame is downsample-only")
    ys = np.linspace(0, h, out_h + 1).astype(np.int64)
    xs = np.linspace(0, w, out_w + 1).astype(np.int64)
    out = np.empty((out_h, out_w), np.uint8)
    f64 = frame.astype(np.int64)
    for i in range(out_h):
        row = f64[ys[i]:ys[i + 1]]
        for j in range(out_w):
            box = row[:, xs[j]:xs[j + 1]]
            out[i, j] = int(box.sum()) // box.size
    return out


def resize_batch(batch: pa.Table, *, out_w: int = 16,
                 out_h: int = 12) -> pa.Table:
    """Media RESIZE stage: decode frame 0 (CRC-validated) and emit the
    box-downsampled thumbnail raster as a binary column plus its CRC32 —
    the resize leg of the decode/feature/resize/frame-sample multimodal
    contract.  Undecodable payloads yield ``status="decode_error"`` with
    empty pixels — never exceptions."""
    ids = np.asarray(batch["item_id"], dtype=np.int64)
    payloads = batch["payload"].to_pylist()
    st, px, crcs = [], [], []
    for r in range(batch.num_rows):
        res = decode_media(payloads[r] or b"")
        if res is None:
            st.append("decode_error")
            px.append(b"")
            crcs.append(-1)
            continue
        (w, h, _nf), frames, _crc = res
        if out_h > h or out_w > w:
            # downsample-only contract: a frame smaller than the target is
            # a defined error row, never an exception or zero-fill garbage
            st.append("too_small")
            px.append(b"")
            crcs.append(-1)
            continue
        small = resize_frame(frames[0], out_w, out_h)
        raw = small.tobytes()
        st.append("ok")
        px.append(raw)
        crcs.append(zlib.crc32(raw) & 0xFFFFFFFF)
    return pa.table({
        "item_id": pa.array(ids, pa.int64()),
        "status": pa.array(st, pa.string()),
        "rw": pa.array(np.full(len(st), out_w, np.int32)),
        "rh": pa.array(np.full(len(st), out_h, np.int32)),
        "pixels": pa.array(px, pa.binary()),
        "px_crc": pa.array(crcs, pa.int64()),
    })


def apply_resize(ds, *, out_w: int = 16, out_h: int = 12,
                 batch_size: int = 16):
    return ds.map_batches(
        lambda b: resize_batch(b, out_w=out_w, out_h=out_h),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def audio_features_batch(batch: pa.Table) -> pa.Table:
    """Audio feature extraction: one output row per decoded CHUNK with
    integer-exact signal features over the centered samples (x − 128):

    * ``energy`` — Σ|x−128| (L1 energy),
    * ``zcr`` — zero-crossing count (sign changes of x−128, zeros counted
      positive — one fixed convention, mirrored in the golden),
    * ``peak`` — max|x−128|.

    Full container decode (CRC-validated) per payload; undecodable payloads
    yield ONE row with ``chunk_idx=-1`` and null features — never
    exceptions (the decode_error row contract of :class:`MediaDecoder`)."""
    ids = np.asarray(batch["item_id"], dtype=np.int64)
    payloads = batch["payload"].to_pylist()
    rep, cidx, energy, zcr, peak = [], [], [], [], []
    for r in range(batch.num_rows):
        res = decode_media(payloads[r] or b"")
        if res is None:
            rep.append(ids[r])
            cidx.append(-1)
            energy.append(None)
            zcr.append(None)
            peak.append(None)
            continue
        _dims, frames, _crc = res
        for fi, fr in enumerate(frames):
            s = fr.reshape(-1).astype(np.int64) - 128
            rep.append(ids[r])
            cidx.append(fi)
            energy.append(int(np.abs(s).sum()))
            zcr.append(int(np.count_nonzero(np.diff(s >= 0))))
            peak.append(int(np.abs(s).max()) if s.size else 0)
    return pa.table({
        "item_id": pa.array(rep, pa.int64()),
        "chunk_idx": pa.array(cidx, pa.int64()),
        "energy": pa.array(energy, pa.int64()),
        "zcr": pa.array(zcr, pa.int64()),
        "peak": pa.array(peak, pa.int64()),
    })


def apply_audio_features(ds, *, batch_size: int = 16):
    """Small batches — audio payloads are wide rows, same sizing rule as
    :func:`apply_decode`."""
    return ds.map_batches(audio_features_batch, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
