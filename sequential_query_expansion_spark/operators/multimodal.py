"""Multimodal column operators: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as `binary`
columns beside the text. The Spark-side plumbing here is real — schemas,
Arrow batch shapes, `mapInPandas` iteration, partition sizing — while the
codec kernels are STUBS: real decoders (PIL/ffmpeg/librosa) are not in
this container, so each kernel routes through ``_decode_stub``, which
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode). Swapping
in a real decoder changes ONE function per modality, nothing else.

Design notes for scale:
- `mapInPandas` (not per-row UDFs): one Arrow batch in, one out, so a
  real decoder amortizes library dispatch over thousands of rows.
- decode outputs are fixed-size feature vectors / thumbnails, never the
  raw decoded frames — the shuffle after extraction moves features only.
- `spark.sql.files.maxPartitionBytes` should be lowered (e.g. 32 MB) for
  binary-heavy tables so a partition of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STRICT = False  # True -> NotImplementedError instead of deterministic fakes

IMAGE_FEAT_DIM = 16
AUDIO_FRAME_HOP_S = 1.0


def _decode_stub(payload: bytes, n_out: int, salt: str,
                 strict: bool | None = None) -> np.ndarray:
    """Deterministic stand-in for a real decoder: n_out floats in [0, 1)
    derived from a keyed digest of the payload."""
    if STRICT if strict is None else strict:
        raise NotImplementedError(
            "real decoder not available in this environment"
        )
    if payload is None:
        return np.zeros(n_out, dtype=np.float32)
    out = np.empty(n_out, dtype=np.float32)
    h = hashlib.blake2b(payload, digest_size=8, person=salt.encode()[:16])
    seed = int.from_bytes(h.digest(), "big")
    rng = np.random.default_rng(seed)
    out[:] = rng.random(n_out, dtype=np.float32)
    return out


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    strict: bool | None = None,
) -> DataFrame:
    """(id, payload binary) -> (id, width, height, feat array<float>).

    Real impl would decode + global-pool a small CNN / CLIP embed; the
    stub derives deterministic dims + features from the bytes.
    """
    _strict = STRICT if strict is None else strict
    schema = f"{id_col} long, width int, height int, feat array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, IMAGE_FEAT_DIM + 2, "img", _strict)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [int(64 + f[0] * 1984) for f in feats],
                    "height": [int(64 + f[1] * 1984) for f in feats],
                    "feat": [f[2:].tolist() for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def image_resize(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool | None = None,
) -> DataFrame:
    """(id, payload) -> (id, thumb binary, thumb_w, thumb_h). Stub emits
    a deterministic byte string of the right nominal size class."""
    _strict = STRICT if strict is None else strict
    schema = f"{id_col} long, thumb binary, thumb_w int, thumb_h int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf[payload_col]:
                fake = _decode_stub(p, 8, "thumb", _strict)
                thumbs.append(fake.tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "thumb": thumbs,
                    "thumb_w": target_w,
                    "thumb_h": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id",
    strict: bool | None = None,
) -> DataFrame:
    """(id, payload) -> (id, duration_s float, mfcc array<float>)."""
    _strict = STRICT if strict is None else strict
    schema = f"{id_col} long, duration_s float, mfcc array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p, 14, "audio", _strict) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "duration_s": [float(1.0 + f[0] * 599.0) for f in feats],
                    "mfcc": [f[1:].tolist() for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def video_frame_sample(
    df: DataFrame,
    every_s: float = AUDIO_FRAME_HOP_S,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    strict: bool | None = None,
) -> DataFrame:
    """(id, payload) -> one row per sampled frame:
    (id, frame_idx, ts_s, frame_feat array<float>). Demonstrates the
    1->N mapInPandas fan-out shape a real frame sampler needs."""
    _strict = STRICT if strict is None else strict
    schema = f"{id_col} long, frame_idx int, ts_s float, frame_feat array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "ts_s": [], "frame_feat": []}
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                base = _decode_stub(p, 1 + max_frames * 4, "video", _strict)
                n = 1 + int(base[0] * (max_frames - 1))
                for fi in range(n):
                    rows[id_col].append(i)
                    rows["frame_idx"].append(fi)
                    rows["ts_s"].append(float(fi) * every_s)
                    rows["frame_feat"].append(
                        base[1 + fi * 4: 1 + (fi + 1) * 4].tolist()
                    )
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def synthesize_payload_table(docs: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text") -> DataFrame:
    """Deterministic binary payloads for testing the plumbing: payload =
    utf-8 of the doc text (stands in for e.g. a WARC image record)."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )
