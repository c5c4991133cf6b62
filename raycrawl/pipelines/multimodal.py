"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with metadata,
processed by actor-pool map_batches stages with SMALL batch sizes (large
binary rows: batch_size is the memory knob). Two decode depths:

* ``parse_image_dims`` / ``HeaderDims`` / ``multimodal_dims`` — a REAL
  pure-Python container parse (PNG IHDR, GIF screen descriptor, JPEG SOF
  marker scan) needing no codec libraries: fmt/width/height/color from the
  leading bytes, garbage-safe.
* full pixel decode — gated behind ``RAYCRAWL_FAKE_DECODE`` (pillow/ffmpeg
  are not in this environment): ``=1`` uses a deterministic byte-histogram
  feature (SQL-reproducible, oracle-exact); ``=0`` routes through the
  header parse. The Ray-side plumbing (schema, actor signature, batch
  sizing, output layout) is identical either way and fully tested.

To make this runnable against the driver-provided tables, ``payloads()``
manufactures the binary column from documents.text utf-8 bytes — the shape
a Common-Crawl WARC image payload column would have.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from raycrawl.pipelines.relops import pool_size

__all__ = [
    "payloads",
    "decode_features",
    "decode_features_flat",
    "frame_sample",
    "parse_image_dims",
    "png_header",
    "gif_header",
    "jpeg_header",
    "image_payloads",
    "multimodal_dims",
    "ImageDecoder",
    "FrameSampler",
    "HeaderDims",
    "wav_header",
    "parse_wav_meta",
    "audio_payloads",
    "multimodal_wav_meta",
    "WavMeta",
    "multimodal_resize",
    "PlaneResizer",
]


def payloads(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload: binary, media_type, n_bytes)."""

    def to_payload(t: pa.Table) -> pa.Table:
        data = [(x or "").encode("utf-8") for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.array(data, pa.binary()),
                "media_type": pa.array(["application/octet-stream"] * t.num_rows),
                "n_bytes": pa.array([len(d) for d in data], pa.int64()),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(to_payload, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# real header decode (no codec libraries needed): PNG / GIF / JPEG
# dimensions + color info from the container's leading bytes
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# every JPEG start-of-frame marker (C0-CF minus the non-SOF C4/C8/CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_dims(payload: bytes) -> tuple:
    """(fmt, width, height, color): pure-Python image header parse.

    PNG: IHDR width/height (big-endian u32) + color type byte. GIF
    (87a/89a): logical-screen width/height (little-endian u16) + packed
    screen-descriptor field. JPEG: scans marker segments from SOI to the
    first start-of-frame and reads height/width (big-endian u16) +
    component count. Anything unrecognized or truncated is
    ("unknown", 0, 0, 0) — a 100-TB crawl corpus always contains garbage
    rows, so the kernel must classify, never raise.
    """
    b = bytes(payload or b"")
    if b[:8] == _PNG_SIG:
        if len(b) >= 26 and b[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                b[25],  # color type (0 gray, 2 rgb, 3 palette, 4/6 +alpha)
            )
        return ("unknown", 0, 0, 0)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 13:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                b[10],  # packed screen-descriptor field
            )
        return ("unknown", 0, 0, 0)
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if marker in _SOF_MARKERS and i + 10 <= len(b):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                    b[i + 9],  # component count (1 gray, 3 YCbCr, 4 CMYK)
                )
            if seglen < 2:
                break
            i += 2 + seglen
        return ("unknown", 0, 0, 0)
    return ("unknown", 0, 0, 0)


def png_header(width: int, height: int, color_type: int = 2,
               bit_depth: int = 8) -> bytes:
    """Signature + complete IHDR chunk (length, type, 13-byte data, CRC)."""
    import zlib

    data = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, 0])
    )
    chunk = b"IHDR" + data
    return (
        _PNG_SIG
        + len(data).to_bytes(4, "big")
        + chunk
        + zlib.crc32(chunk).to_bytes(4, "big")
    )


def gif_header(width: int, height: int, packed: int = 0x87) -> bytes:
    """GIF89a magic + 7-byte logical screen descriptor."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
        + bytes([packed, 0, 0])
    )


def jpeg_header(width: int, height: int, n_components: int = 3) -> bytes:
    """SOI + JFIF APP0 + a baseline SOF0 segment (39 bytes for 3
    components) — enough container for any dimensions parser."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(
        [1, 1, 0, 0, 1, 0, 1, 0, 0]
    )
    sof_data = (
        bytes([8])
        + height.to_bytes(2, "big")
        + width.to_bytes(2, "big")
        + bytes([n_components])
        + b"".join(bytes([i + 1, 0x11, 0]) for i in range(n_components))
    )
    sof = b"\xff\xc0" + (2 + len(sof_data)).to_bytes(2, "big") + sof_data
    return b"\xff\xd8" + app0 + sof


def image_payloads(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload) where payload is a REAL image header
    (PNG / JPEG / GIF cycling by doc_id) with dimensions derived from
    doc_id and the document text as body bytes — the deterministic
    synthetic stand-in for a WARC image-payload column, reproducible in
    closed form by the multimodal_dims SQL oracle."""

    def build(t: pa.Table) -> pa.Table:
        payloads_, ids = [], t["doc_id"].to_pylist()
        for doc_id, text in zip(ids, t["text"].to_pylist()):
            w = 16 + (doc_id * 7) % 1000
            h = 16 + (doc_id * 13) % 800
            kind = doc_id % 3
            if kind == 0:
                head = png_header(w, h)
            elif kind == 1:
                head = jpeg_header(w, h)
            else:
                head = gif_header(w, h)
            payloads_.append(head + (text or "").encode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads_, pa.binary()),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(build, batch_format="pyarrow")


class HeaderDims:
    """Actor-pool stage: parse_image_dims over binary payload batches.
    Stateless today; __init__ is where a full decoder would load codecs —
    the signature and batch sizing match ImageDecoder's."""

    def __call__(self, t: pa.Table) -> pa.Table:
        fmts, ws, hs, colors, sizes = [], [], [], [], []
        for payload in t["payload"].to_pylist():
            b = bytes(payload or b"")
            fmt, w, h, c = parse_image_dims(b)
            fmts.append(fmt)
            ws.append(w)
            hs.append(h)
            colors.append(c)
            sizes.append(len(b))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "color": pa.array(colors, pa.int64()),
                "n_bytes": pa.array(sizes, pa.int64()),
            }
        )


def multimodal_dims(sf_dir: str, batch_size: int = 256) -> rd.Dataset:
    """image_payloads -> (doc_id, fmt, width, height, color, n_bytes) via
    the REAL pure-Python header parser (small batches: binary rows are the
    memory unit)."""
    return image_payloads(sf_dir).map_batches(
        HeaderDims,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )


class ImageDecoder:
    """Actor-pool decode/feature-extract stage over binary payloads.

    __init__ is where a real deployment loads the codec/model once per
    actor. Two decode paths behind the RAYCRAWL_FAKE_DECODE seam:

    * ``=1`` (default, used by the multimodal_decode oracle): a
      deterministic byte-histogram feature stands in for a full pixel
      decode — SQL-reproducible, so the oracle stays exact.
    * ``=0``: the REAL pure-Python container parse (parse_image_dims) —
      fmt/width/height/color from PNG/GIF/JPEG headers, no codec
      libraries needed. Full pixel decoding (pillow/ffmpeg) would load
      here per actor; the header parse is the honest codec-free subset.
    """

    _FMT_CODE = {"unknown": 0, "png": 1, "jpeg": 2, "gif": 3}

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.fake = os.environ.get("RAYCRAWL_FAKE_DECODE", "1") == "1"

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            fmt, w, h, c = parse_image_dims(payload)
            out = np.zeros(self.feature_dim, np.int64)
            out[: 5] = (self._FMT_CODE[fmt], w, h, c, len(payload))[: self.feature_dim]
            return out
        # deterministic stand-in: byte histogram folded to feature_dim
        counts = np.bincount(
            np.frombuffer(payload, dtype=np.uint8), minlength=256
        ).astype(np.int64)
        return counts.reshape(self.feature_dim, -1).sum(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, digests, first = [], [], []
        for payload in t["payload"].to_pylist():
            b = bytes(payload or b"")
            feats.append(self._decode(b).tolist())
            # md5: DuckDB computes the identical digest, which is what lets
            # the multimodal_decode oracle reproduce this column in SQL
            digests.append(hashlib.md5(b).hexdigest())
            first.append(b[0] if b else 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": t["n_bytes"],
                "first_byte": pa.array(first, pa.int64()),
                "digest": pa.array(digests, pa.string()),
                "feature": pa.array(feats, pa.list_(pa.int64())),
            }
        )


def decode_features(sf_dir: str, batch_size: int = 256) -> rd.Dataset:
    """payloads -> decoded features. Small batch_size on purpose: binary
    payload batches are the memory unit at scale (batch x concurrency must
    fit the worker heap)."""
    return payloads(sf_dir).map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage over binary payloads (the video
    analog of ImageDecoder): treat the payload as fixed-size frames and
    keep every ``stride``-th one. A real deployment decodes containers
    here (ffmpeg per actor in __init__); the frame arithmetic, batch
    sizing and output layout are the real, tested plumbing."""

    def __init__(self, frame_bytes: int = 64, stride: int = 4):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, t: pa.Table) -> pa.Table:
        n_frames, n_sampled, digests = [], [], []
        fb, st = self.frame_bytes, self.stride
        for payload in t["payload"].to_pylist():
            b = bytes(payload or b"")
            total = len(b) // fb  # only complete frames
            picks = range(0, total, st)
            sampled = b"".join(b[i * fb : (i + 1) * fb] for i in picks)
            n_frames.append(total)
            n_sampled.append(len(picks))
            digests.append(hashlib.md5(sampled).hexdigest())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_frames": pa.array(n_frames, pa.int64()),
                "n_sampled": pa.array(n_sampled, pa.int64()),
                "sample_digest": pa.array(digests, pa.string()),
            }
        )


def frame_sample(sf_dir: str, frame_bytes: int = 64, stride: int = 4,
                 batch_size: int = 256) -> rd.Dataset:
    """payloads -> sampled-frame summary (count + md5 over the kept
    frames). Small batches: binary rows are the memory unit."""
    return payloads(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs=dict(frame_bytes=frame_bytes, stride=stride),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )


def decode_features_flat(sf_dir: str, feature_dim: int = 8) -> rd.Dataset:
    """decode_features with the feature vector flattened to f0..f{d-1}
    int columns — the SQL-comparable projection the correctness oracle
    consumes (list columns don't hash stably through the compare)."""

    def flat(t: pa.Table) -> pa.Table:
        import numpy as np

        feats = np.array(t["feature"].to_pylist(), dtype=np.int64).reshape(
            t.num_rows, feature_dim
        )
        cols = {
            "doc_id": t["doc_id"],
            "n_bytes": t["n_bytes"],
            "first_byte": t["first_byte"],
            "digest": t["digest"],
        }
        for i in range(feature_dim):
            cols[f"f{i}"] = pa.array(feats[:, i])
        return pa.table(cols)

    return decode_features(sf_dir).map_batches(flat, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Audio (WAV/RIFF) headers — round 4
# ---------------------------------------------------------------------------


def wav_header(sample_rate: int, channels: int, bits: int,
               n_data_bytes: int) -> bytes:
    """Minimal canonical RIFF/WAVE header (PCM fmt chunk + data chunk
    declaration) for a payload carrying ``n_data_bytes`` of sample data."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + n_data_bytes),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                        byte_rate, block_align, bits),
            b"data",
            struct.pack("<I", n_data_bytes),
        ]
    )


def parse_wav_meta(payload: bytes) -> tuple:
    """(sample_rate, channels, bits, n_data_bytes) from a RIFF/WAVE
    payload by walking the chunk list — garbage-safe: anything that isn't
    a well-formed RIFF/WAVE with a PCM fmt chunk returns (0, 0, 0, 0)."""
    import struct

    b = payload or b""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (0, 0, 0, 0)
    pos, rate, ch, bits, data_len, have_fmt = 12, 0, 0, 0, 0, False
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4:pos + 8])
        if cid == b"fmt " and clen >= 16 and pos + 8 + 16 <= len(b):
            _, ch, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[pos + 8:pos + 24]
            )
            have_fmt = True
        elif cid == b"data":
            data_len = clen
        # chunks are word-aligned: odd lengths carry a pad byte
        pos += 8 + clen + (clen & 1)
    if not have_fmt:
        return (0, 0, 0, 0)
    return (rate, ch, bits, data_len)


_WAV_RATES = (8000, 16000, 22050, 44100)


def audio_payloads(sf_dir: str) -> rd.Dataset:
    """documents -> (doc_id, payload) where payload is a REAL WAV header
    (rate/channels cycling by doc_id, 16-bit PCM) with the document text
    as sample bytes — the audio twin of :func:`image_payloads`,
    reproducible in closed form by the multimodal_wav_meta SQL oracle."""

    def build(t: pa.Table) -> pa.Table:
        payloads_, ids = [], t["doc_id"].to_pylist()
        for doc_id, text in zip(ids, t["text"].to_pylist()):
            data = (text or "").encode("utf-8")
            rate = _WAV_RATES[doc_id % 4]
            channels = 1 + doc_id % 2
            payloads_.append(
                wav_header(rate, channels, 16, len(data)) + data
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "payload": pa.array(payloads_, pa.binary()),
            }
        )

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(build, batch_format="pyarrow")


class WavMeta:
    """Actor-pool stage: parse_wav_meta over binary payload batches, plus
    the exact-integer duration (frames * 1000 // rate) a sampler needs."""

    def __call__(self, t: pa.Table) -> pa.Table:
        rates, chs, bits_, nbytes, frames, durs = [], [], [], [], [], []
        for payload in t["payload"].to_pylist():
            rate, ch, bits, data_len = parse_wav_meta(bytes(payload or b""))
            block = ch * bits // 8 if ch and bits else 0
            n_frames = data_len // block if block else 0
            rates.append(rate)
            chs.append(ch)
            bits_.append(bits)
            nbytes.append(data_len)
            frames.append(n_frames)
            durs.append(n_frames * 1000 // rate if rate else 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sample_rate": pa.array(rates, pa.int64()),
                "channels": pa.array(chs, pa.int64()),
                "bits": pa.array(bits_, pa.int64()),
                "n_data_bytes": pa.array(nbytes, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
                "duration_ms": pa.array(durs, pa.int64()),
            }
        )


def multimodal_wav_meta(sf_dir: str, batch_size: int = 256) -> rd.Dataset:
    """audio_payloads -> per-doc audio metadata via the REAL pure-Python
    RIFF chunk walk (small batches: binary rows are the memory unit)."""
    return audio_payloads(sf_dir).map_batches(
        WavMeta,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# Resize — round 4 (the remaining stage of the decode / feature-extract /
# resize / frame-sample quartet)
# ---------------------------------------------------------------------------


class PlaneResizer:
    """Actor-pool nearest-neighbor resize stage over image payloads.

    The source dimensions come from the REAL header parse
    (:func:`parse_image_dims` over the payload bytes); the pixel plane
    itself is the documented codec-free stand-in (same seam as
    ImageDecoder): plane(y, x) = (doc_id*31 + y*7 + x*13) % 256 — a
    deterministic function a SQL twin reproduces, standing where a pillow
    decode would put real pixels. What IS real and tested end to end is
    everything a resize stage must get right at scale: the header-derived
    source dims, the nearest-neighbor coordinate map src = t * src_dim //
    out_dim, the gather, and the integer output aggregates. The gather is
    vectorized across the whole batch — (n, out_h, out_w) index math, no
    per-pixel Python and the full source plane NEVER materializes (only
    the out_h x out_w sampled coordinates are computed)."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ws = np.zeros(n, np.int64)
        hs = np.zeros(n, np.int64)
        for i, payload in enumerate(t["payload"].to_pylist()):
            _, w, h, _ = parse_image_dims(bytes(payload or b""))
            ws[i], hs[i] = w, h
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (ws > 0) & (hs > 0)
        tw, th = self.out_w, self.out_h
        # nearest-neighbor source coordinates, batch-vectorized
        sy = (np.arange(th, dtype=np.int64)[None, :] * hs[:, None]) // th
        sx = (np.arange(tw, dtype=np.int64)[None, :] * ws[:, None]) // tw
        px = (
            ids[:, None, None] * 31 + sy[:, :, None] * 7 + sx[:, None, :] * 13
        ) % 256
        px_sum = np.where(ok, px.sum(axis=(1, 2)), 0)
        px_min = np.where(ok, px.min(axis=(1, 2)), 0)
        px_max = np.where(ok, px.max(axis=(1, 2)), 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "out_w": pa.array(np.where(ok, tw, 0), pa.int64()),
                "out_h": pa.array(np.where(ok, th, 0), pa.int64()),
                "px_sum": pa.array(px_sum, pa.int64()),
                "px_min": pa.array(px_min, pa.int64()),
                "px_max": pa.array(px_max, pa.int64()),
            }
        )


def multimodal_resize(sf_dir: str, out_w: int = 16, out_h: int = 16,
                      batch_size: int = 256) -> rd.Dataset:
    """image_payloads -> per-doc resized-thumbnail integer summary
    (nearest-neighbor to ``out_w`` x ``out_h``; dims from the REAL header
    parse). Small batches: binary rows are the memory unit."""
    return image_payloads(sf_dir).map_batches(
        PlaneResizer,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )


class AHasher(PlaneResizer):
    """Average-hash (aHash) stage: the classic perceptual image-dedup
    fingerprint — resize to 16x16 (nearest-neighbor over the header-real
    dims, same seam as PlaneResizer), threshold each pixel against the
    plane MEAN, and pack the 256 bits into four int64 words. Two images
    are near-duplicates when the Hamming distance of their hashes is
    small; the hash itself is the join/blocking key. Bit packing is one
    vectorized matmul against a power-of-two vector per word — no
    per-pixel Python."""

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ws = np.zeros(n, np.int64)
        hs = np.zeros(n, np.int64)
        for i, payload in enumerate(t["payload"].to_pylist()):
            _, w, h, _ = parse_image_dims(bytes(payload or b""))
            ws[i], hs[i] = w, h
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = (ws > 0) & (hs > 0)
        tw, th = self.out_w, self.out_h
        sy = (np.arange(th, dtype=np.int64)[None, :] * hs[:, None]) // th
        sx = (np.arange(tw, dtype=np.int64)[None, :] * ws[:, None]) // tw
        px = (
            ids[:, None, None] * 31 + sy[:, :, None] * 7 + sx[:, None, :] * 13
        ) % 256
        flat = px.reshape(n, th * tw)
        # strict > mean, in exact integers: px * n_px > sum(px)
        n_px = th * tw
        bits = (flat * n_px) > flat.sum(axis=1, keepdims=True)
        words = bits.reshape(n, 4, 64).astype(np.int64)
        pows = (np.int64(1) << np.arange(63, dtype=np.int64))
        # bit 63 would overflow signed int64 via 1<<63: fold it in as the
        # sign bit (two's complement) so SQL BIGINT reproduces it exactly
        lo63 = (words[:, :, :63] * pows).sum(axis=2)
        hash_words = np.where(
            words[:, :, 63] == 1, lo63 + np.int64(-(2**63)), lo63
        )
        hash_words = np.where(ok[:, None], hash_words, 0)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h0": pa.array(hash_words[:, 0], pa.int64()),
                "h1": pa.array(hash_words[:, 1], pa.int64()),
                "h2": pa.array(hash_words[:, 2], pa.int64()),
                "h3": pa.array(hash_words[:, 3], pa.int64()),
            }
        )


def multimodal_ahash(sf_dir: str, out_w: int = 16, out_h: int = 16,
                     batch_size: int = 256) -> rd.Dataset:
    """image_payloads -> (doc_id, h0..h3): 256-bit perceptual aHash per
    image (dims from the REAL header parse, plane from the documented
    codec-free stand-in). The image-dedup primitive: exact-dup images
    collide on all four words; near-dups differ in few bits."""
    return image_payloads(sf_dir).map_batches(
        AHasher,
        fn_constructor_kwargs=dict(out_w=out_w, out_h=out_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(),
        num_cpus=1,
    )
