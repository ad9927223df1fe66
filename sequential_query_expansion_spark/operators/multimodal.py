"""Multimodal column operators: binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as `binary`
columns beside the text. Round-1 shipped these with stubbed codecs;
the decoders are now REAL where the format allows it without external
libraries (functions/media.py):

  images — spec-conformant PNG encode/decode (zlib scanline codec, all
           five filters, CRC-checked); features and nearest-neighbour
           resize operate on actual pixels.
  audio  — RIFF/WAV PCM via the stdlib, real mel-frequency cepstra
           (Hann frames → power spectrum → mel filterbank → log →
           DCT-II) in numpy.
  video  — a minimal seekable PNG-frame container (MPNG) stands in for
           mp4/webm because real demuxers need ffmpeg (absent); the
           sampler reads ONLY the sampled frames' bytes, which is the
           access pattern a real demuxer provides. Swapping in ffmpeg
           changes one decode call.

Design notes for scale:
- `mapInPandas` (not per-row UDFs): one Arrow batch in, one out, so the
  codec amortizes dispatch over thousands of rows.
- decode outputs are fixed-size feature vectors / thumbnails, never the
  raw decoded frames — the shuffle after extraction moves features only.
- `spark.sql.files.maxPartitionBytes` should be lowered (e.g. 32 MB) for
  binary-heavy tables so a partition of payloads fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import media

IMAGE_FEAT_DIM = 16  # mean/std per RGB channel + 8-bin gray hist + aspect + mean gray


def _to_rgb(img: np.ndarray) -> np.ndarray:
    if img.shape[2] == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3]


def _image_feat(img: np.ndarray) -> np.ndarray:
    """16 floats: per-channel mean/std (RGB, /255), normalized 8-bin
    grayscale histogram, aspect ratio (w/h), mean gray (/255)."""
    rgb = _to_rgb(img).astype(np.float64)
    h, w = rgb.shape[:2]
    gray = rgb.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    return np.concatenate([
        rgb.reshape(-1, 3).mean(axis=0) / 255.0,
        rgb.reshape(-1, 3).std(axis=0) / 255.0,
        hist / gray.size,
        [w / h, gray.mean() / 255.0],
    ]).astype(np.float32)


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload PNG) -> (id, width, height, feat array<float>[16]).
    NULL payloads are dropped (no output row), like a quality gate."""
    schema = f"{id_col} long, width int, height int, feat array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "width": [], "height": [], "feat": []}
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                if p is None:
                    continue
                img = media.png_decode(p)
                rows[id_col].append(i)
                rows["width"].append(img.shape[1])
                rows["height"].append(img.shape[0])
                rows["feat"].append(_image_feat(img).tolist())
            if rows[id_col]:  # all-NULL batches: empty pandas columns
                yield pd.DataFrame(rows)  # default to float64, which Arrow
                                          # cannot cast to list<float>

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def image_resize(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, payload PNG) -> (id, thumb binary PNG, thumb_w, thumb_h):
    real decode → nearest-neighbour resize → re-encode. NULL payloads
    are dropped (no output row)."""
    schema = f"{id_col} long, thumb binary, thumb_w int, thumb_h int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs = [], []
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                if p is None:
                    continue
                ids.append(i)
                thumbs.append(
                    media.png_encode(
                        media.resize_nn(media.png_decode(p), target_w, target_h)
                    )
                )
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "thumb": thumbs,
                        "thumb_w": target_w,
                        "thumb_h": target_h,
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def audio_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload WAV) -> (id, duration_s, mfcc array<float>[13]):
    real PCM decode + clip-mean MFCCs. NULL payloads are dropped."""
    schema = f"{id_col} long, duration_s float, mfcc array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "duration_s": [], "mfcc": []}
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                if p is None:
                    continue
                samples, rate = media.wav_decode(p)
                rows[id_col].append(i)
                rows["duration_s"].append(float(len(samples)) / rate)
                rows["mfcc"].append(
                    media.mfcc_frames(samples, rate)
                    .mean(axis=0)
                    .astype(np.float32)
                    .tolist()
                )
            if rows[id_col]:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


def video_frame_sample(
    df: DataFrame,
    every_s: float = 1.0,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, payload MPNG) -> one row per sampled frame:
    (id, frame_idx, ts_s, frame_feat array<float>[4]). Seeks to the
    sampled frames only (container offsets) and decodes just those —
    the 1->N mapInPandas fan-out with demuxer-style selective reads.
    NULL payloads are dropped."""
    if every_s <= 0:
        raise ValueError(f"every_s must be > 0, got {every_s}")
    schema = f"{id_col} long, frame_idx int, ts_s float, frame_feat array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "frame_idx": [], "ts_s": [], "frame_feat": []}
            for i, p in zip(pdf[id_col].values, pdf[payload_col]):
                if p is None:
                    continue
                n, fps, offsets = media.mpng_info(p)
                picked, seen = [], set()
                t = 0.0
                while len(picked) < max_frames:
                    fi = int(round(t * fps))
                    if fi >= n:
                        break
                    if fi not in seen:
                        seen.add(fi)
                        picked.append((fi, t))
                    t += every_s
                for fi, ts in picked:
                    img = _to_rgb(media.mpng_frame(p, offsets, fi)).astype(
                        np.float64
                    )
                    gray = img.mean(axis=2)
                    feat = np.concatenate(
                        [img.reshape(-1, 3).mean(axis=0) / 255.0,
                         [gray.std() / 255.0]]
                    ).astype(np.float32)
                    rows[id_col].append(i)
                    rows["frame_idx"].append(fi)
                    rows["ts_s"].append(float(ts))
                    rows["frame_feat"].append(feat.tolist())
            if rows[id_col]:
                yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# Deterministic payload synthesis (test fixtures: real encoded bytes)
# ---------------------------------------------------------------------------

def _synth_image_pixels(doc_id: int, w: int = 32, h: int = 24) -> np.ndarray:
    """Deterministic RGB pixel array — exposed separately so oracles can
    recompute features from the RAW pixels, making the PNG encode/decode
    round-trip part of what a value comparison verifies."""
    rng = np.random.default_rng(doc_id)
    x = np.linspace(0, 255, w, dtype=np.float64)[None, :]
    y = np.linspace(0, 255, h, dtype=np.float64)[:, None]
    return np.stack(
        [
            (x + doc_id * 7) % 256 + 0 * y,
            (y + doc_id * 13) % 256 + 0 * x,
            rng.integers(0, 256, size=(h, w)).astype(np.float64),
        ],
        axis=2,
    ).astype(np.uint8)


def _synth_image(doc_id: int, w: int = 32, h: int = 24) -> bytes:
    return media.png_encode(_synth_image_pixels(doc_id, w, h))


def _synth_audio_samples(doc_id: int, rate: int = 8000) -> np.ndarray:
    """Deterministic raw int16 PCM — exposed separately so oracles can
    recompute features from the RAW samples, making the WAV encode/decode
    round-trip part of what a value comparison verifies."""
    rng = np.random.default_rng(doc_id)
    dur = 0.5 + (doc_id % 8) * 0.25
    t = np.arange(int(dur * rate)) / rate
    f1, f2 = 200.0 + (doc_id % 10) * 50.0, 1000.0 + (doc_id % 5) * 120.0
    sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.25 * np.sin(2 * np.pi * f2 * t)
    sig += 0.02 * rng.standard_normal(len(t))
    return (sig * 20000).astype(np.int16)


def _synth_audio(doc_id: int, rate: int = 8000) -> bytes:
    return media.wav_encode(_synth_audio_samples(doc_id, rate), rate)


def _synth_video_frames(doc_id: int, w: int = 16, h: int = 12) -> list:
    """Deterministic raw RGB frames — exposed separately so oracles can
    recompute per-frame features from the RAW pixels, making the MPNG
    container round-trip part of what a value comparison verifies."""
    n = 3 + doc_id % 4
    frames = []
    for fi in range(n):
        base = np.full((h, w, 3), (40 * fi + doc_id * 11) % 256, dtype=np.uint8)
        base[:, : (fi + 1) * w // (n + 1), 0] = 255
        frames.append(base)
    return frames


def _synth_video(doc_id: int, w: int = 16, h: int = 12, fps: int = 4) -> bytes:
    return media.mpng_encode(_synth_video_frames(doc_id, w, h), fps)


def synthesize_image_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return _synthesize(docs, id_col, _synth_image)


def synthesize_audio_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return _synthesize(docs, id_col, _synth_audio)


def synthesize_video_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return _synthesize(docs, id_col, _synth_video)


def _synthesize(docs: DataFrame, id_col: str, gen) -> DataFrame:
    schema = f"{id_col} long, payload binary"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "payload": [gen(int(i)) for i in pdf[id_col].values],
                }
            )

    return docs.select(id_col).mapInPandas(fn, schema=schema)
