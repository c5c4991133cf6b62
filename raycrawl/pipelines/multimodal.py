"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with metadata,
processed by actor-pool map_batches stages with SMALL batch sizes (large
binary rows: batch_size is the memory knob). The decode kernels themselves
are STUBBED — the real image/audio libraries are not in this environment —
behind ``RAYCRAWL_FAKE_DECODE``: the Ray-side plumbing (schema, actor
signature, batch sizing, output layout) is real and tested; the stub is a
deterministic byte-level feature extractor standing in for a decoder.

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
    "ImageDecoder",
    "FrameSampler",
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


class ImageDecoder:
    """Actor-pool decode/feature-extract stage over binary payloads.

    __init__ is where a real deployment loads the codec/model once per
    actor. Without the real library the decode path raises
    NotImplementedError unless RAYCRAWL_FAKE_DECODE=1 (the default used by
    tests/pipelines), in which case a deterministic byte-histogram feature
    stands in for the decoded representation.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.fake = os.environ.get("RAYCRAWL_FAKE_DECODE", "1") == "1"
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires pillow/ffmpeg — not available in "
                "this environment; set RAYCRAWL_FAKE_DECODE=1"
            )

    def _decode(self, payload: bytes) -> np.ndarray:
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
