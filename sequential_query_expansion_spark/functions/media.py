"""Dependency-free media codecs for the multimodal operators.

The container has no PIL/ffmpeg/librosa, but two of the three modalities
do NOT need them — their formats are decodable with the stdlib + numpy:

  PNG   — zlib (stdlib) + the five scanline filters. ``png_encode`` /
          ``png_decode`` are REAL, spec-conformant for 8-bit
          non-interlaced grayscale/RGB/RGBA (the subset every thumbnail
          pipeline emits); round-trips are lossless and CRC-checked.
  WAV   — RIFF PCM via the stdlib ``wave`` module; 16-bit mono/stereo.
  MFCC  — real mel-frequency cepstra in numpy: framed Hann windows →
          power spectrum (rfft) → mel filterbank → log → orthonormal
          DCT-II. No approximations beyond the standard pipeline.
  MPNG  — a minimal length-prefixed PNG-frame container standing in for
          mp4/webm (real video demuxers need ffmpeg, which is absent);
          the header carries (n_frames, fps) so frame sampling seeks to
          the sampled frames WITHOUT decoding the rest — the property a
          real demuxer gives you.

Reference parity note: the reference pipeline is text-only; these back
the training-data-pipeline operators (operators/multimodal.py) that a
100 TB corpus needs beside the text columns.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from typing import List, Tuple

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE_TO_CH = {0: 1, 2: 3, 6: 4}
_CH_TO_CTYPE = {1: 0, 3: 2, 4: 6}

MPNG_MAGIC = b"MPNG"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes (filter 0 rows)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    ctype = _CH_TO_CTYPE[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, ch) uint8. 8-bit non-interlaced
    grayscale/RGB/RGBA; all five scanline filters; chunk CRCs checked."""
    if bytes(data[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    off, idat = 8, []
    w = h = ch = None
    while off + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        typ = bytes(data[off + 4:off + 8])
        payload = bytes(data[off + 8:off + 8 + ln])
        (crc,) = struct.unpack_from(">I", data, off + 8 + ln)
        if crc != zlib.crc32(typ + payload) & 0xFFFFFFFF:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or inter != 0 or ctype not in _CTYPE_TO_CH:
                raise ValueError(
                    "unsupported PNG (8-bit non-interlaced gray/RGB/RGBA only)"
                )
            ch = _CTYPE_TO_CH[ctype]
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        off += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        )
        if f == 0:
            cur = line.copy()
        elif f == 1:   # Sub: per byte-lane running sum mod 256
            cur = (
                np.cumsum(line.reshape(w, ch).astype(np.uint64), axis=0)
                & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:   # Up
            cur = line + prev
        elif f == 3:   # Average (sequential in x by definition)
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                cur[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:   # Paeth (sequential in x by definition)
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def resize_nn(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbour resize (deterministic, no resampling kernel)."""
    h, w = img.shape[:2]
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM, 16-bit)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(s.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> Tuple[np.ndarray, int]:
    """WAV bytes -> (int16 mono samples, rate); stereo is mixed down."""
    with wave.open(io.BytesIO(bytes(data)), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        nch, rate = wf.getnchannels(), wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    s = np.frombuffer(raw, dtype=np.int16)
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return s, rate


# ---------------------------------------------------------------------------
# MFCC (pure numpy)
# ---------------------------------------------------------------------------

def _mel_filterbank(rate: int, n_fft: int, n_mels: int) -> np.ndarray:
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    hz = mel2hz(np.linspace(hz2mel(0.0), hz2mel(rate / 2.0), n_mels + 2))
    bins = np.floor((n_fft + 1) * hz / rate).astype(int)
    fb = np.zeros((n_mels, n_bins))
    for m in range(1, n_mels + 1):
        lo, ce, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, min(ce, n_bins)):
            fb[m - 1, k] = (k - lo) / max(1, ce - lo)
        for k in range(ce, min(hi, n_bins)):
            fb[m - 1, k] = (hi - k) / max(1, hi - ce)
    return fb


def _dct_matrix(k: int, n: int) -> np.ndarray:
    m = np.cos(
        np.pi * np.arange(k)[:, None] * (2.0 * np.arange(n)[None, :] + 1.0)
        / (2.0 * n)
    ) * np.sqrt(2.0 / n)
    m[0] *= np.sqrt(0.5)
    return m


def mfcc_frames(
    samples: np.ndarray, rate: int,
    n_mfcc: int = 13, n_mels: int = 26,
) -> np.ndarray:
    """int16 samples -> (n_frames, n_mfcc) MFCCs (25 ms Hann frames,
    10 ms hop, mel filterbank, log, orthonormal DCT-II)."""
    frame = max(64, int(0.025 * rate))
    hop = max(16, int(0.010 * rate))
    x = samples.astype(np.float64) / 32768.0
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    windowed = x[idx] * np.hanning(frame)
    power = np.abs(np.fft.rfft(windowed, axis=1)) ** 2
    fb = _mel_filterbank(rate, frame, n_mels)
    logmel = np.log(power @ fb.T + 1e-10)
    return logmel @ _dct_matrix(n_mfcc, n_mels).T


# ---------------------------------------------------------------------------
# MPNG video container (PNG frames, length-prefixed, seekable)
# ---------------------------------------------------------------------------

def mpng_encode(frames: List[np.ndarray], fps: int) -> bytes:
    if not 1 <= fps <= 0xFFFF:
        raise ValueError(f"fps must be in [1, 65535], got {fps}")
    parts = [MPNG_MAGIC, struct.pack(">IH", len(frames), fps)]
    for f in frames:
        p = png_encode(f)
        parts.append(struct.pack(">I", len(p)))
        parts.append(p)
    return b"".join(parts)


def mpng_info(data: bytes) -> Tuple[int, int, List[int]]:
    """-> (n_frames, fps, frame byte offsets) WITHOUT decoding frames —
    sampling seeks straight to the wanted frames like a real demuxer."""
    if bytes(data[:4]) != MPNG_MAGIC:
        raise ValueError("not an MPNG container")
    if len(data) < 10:
        raise ValueError("truncated MPNG container (short header)")
    n, fps = struct.unpack_from(">IH", data, 4)
    if fps < 1:
        raise ValueError("MPNG header declares fps=0")
    offsets, off = [], 10
    for _ in range(n):
        if off + 4 > len(data):
            raise ValueError("truncated MPNG container (missing frame length)")
        (ln,) = struct.unpack_from(">I", data, off)
        if off + 4 + ln > len(data):
            raise ValueError("truncated MPNG container (short frame)")
        offsets.append(off + 4)
        off += 4 + ln
    return n, fps, offsets


def mpng_frame(data: bytes, offsets: List[int], i: int) -> np.ndarray:
    (ln,) = struct.unpack_from(">I", data, offsets[i] - 4)
    return png_decode(data[offsets[i]:offsets[i] + ln])
