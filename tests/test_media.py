"""Codec-level tests for functions/media.py: PNG (all five scanline
filters, CRC), WAV round-trip, MFCC physics, MPNG container seeks.
Pure numpy — no SparkSession."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sequential_query_expansion_spark.functions import media


def _rand_img(rng, h, w, ch):
    return rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_lossless(ch):
    rng = np.random.default_rng(7 + ch)
    img = _rand_img(rng, 13, 21, ch)
    assert (media.png_decode(media.png_encode(img)) == img).all()


def test_png_rejects_bad_crc():
    buf = bytearray(media.png_encode(np.zeros((4, 4, 3), dtype=np.uint8)))
    buf[-5] ^= 0xFF  # corrupt IEND crc
    with pytest.raises(ValueError, match="CRC"):
        media.png_decode(bytes(buf))


def test_png_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        media.png_decode(b"JFIF....")


def _filter_line(f, line, prev, ch):
    """Forward PNG filter (encoder direction) for building test streams."""
    n = len(line)
    out = np.empty(n, dtype=np.uint8)
    for x in range(n):
        a = int(line[x - ch]) if x >= ch else 0
        b = int(prev[x])
        c = int(prev[x - ch]) if x >= ch else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (int(line[x]) - pred) & 0xFF
    return out


@pytest.mark.parametrize("ch", [1, 3])
def test_png_decodes_all_filter_types(ch):
    """Hand-build a PNG whose rows use filters 0..4 (our encoder only
    emits 0); the decoder must invert every type exactly."""
    rng = np.random.default_rng(42)
    h, w = 5, 9
    img = _rand_img(rng, h, w, ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        f = y % 5
        line = img[y].reshape(-1)
        raw.append(f)
        raw.extend(_filter_line(f, line, prev, ch).tobytes())
        prev = line
    ctype = {1: 0, 3: 2}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(bytes(raw)))
           + chunk(b"IEND", b""))
    assert (media.png_decode(buf) == img).all()


def test_resize_nn_exact_on_divisible_grid():
    img = np.arange(4 * 8 * 3, dtype=np.uint8).reshape(4, 8, 3)
    out = media.resize_nn(img, 4, 2)
    assert out.shape == (2, 4, 3)
    assert (out == img[::2][:, ::2]).all()


def test_wav_roundtrip_and_stereo_mixdown():
    rng = np.random.default_rng(3)
    mono = rng.integers(-30000, 30000, size=4000).astype(np.int16)
    s, rate = media.wav_decode(media.wav_encode(mono, 8000))
    assert rate == 8000 and (s == mono).all()


def test_mfcc_sine_energy_lands_in_right_mel_band():
    """A pure 1 kHz tone must put more energy in the mel filter covering
    1 kHz than a 200 Hz tone does — MFCCs invert cleanly to mel energies
    via the orthonormal DCT, so compare reconstructed log-mel."""
    rate = 8000
    t = np.arange(rate) / rate

    def logmel(freq):
        sig = (20000 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        frame = max(64, int(0.025 * rate))
        windowed = sig[:frame].astype(np.float64) / 32768.0 * np.hanning(frame)
        power = np.abs(np.fft.rfft(windowed)) ** 2
        fb = media._mel_filterbank(rate, frame, 26)
        return np.log(power @ fb.T + 1e-10)

    lm_1k, lm_200 = logmel(1000.0), logmel(200.0)
    # the argmax band of each tone must differ and be ordered low->high
    assert lm_200.argmax() < lm_1k.argmax()


def test_mfcc_frames_shape():
    rate = 8000
    sig = np.zeros(rate, dtype=np.int16)
    out = media.mfcc_frames(sig, rate)
    assert out.shape[1] == 13 and out.shape[0] > 50


def test_mpng_seek_decodes_only_requested_frame():
    frames = [np.full((6, 8, 3), 10 * i, dtype=np.uint8) for i in range(5)]
    buf = media.mpng_encode(frames, fps=4)
    n, fps, offsets = media.mpng_info(buf)
    assert (n, fps, len(offsets)) == (5, 4, 5)
    for i in (0, 2, 4):
        assert (media.mpng_frame(buf, offsets, i) == frames[i]).all()


def test_mpng_rejects_other_containers():
    with pytest.raises(ValueError, match="MPNG"):
        media.mpng_info(b"RIFFxxxx")


def test_mpng_rejects_fps_zero_both_ends():
    """fps=0 would make a time-step sampler loop forever; the encoder
    refuses to produce it and the parser refuses to accept it."""
    frame = [np.zeros((2, 2, 3), dtype=np.uint8)]
    with pytest.raises(ValueError, match="fps"):
        media.mpng_encode(frame, fps=0)
    crafted = media.MPNG_MAGIC + struct.pack(">IH", 0, 0)
    with pytest.raises(ValueError, match="fps=0"):
        media.mpng_info(crafted)


def test_mpng_rejects_truncated_container():
    buf = media.mpng_encode(
        [np.zeros((4, 4, 3), dtype=np.uint8) for _ in range(3)], fps=2
    )
    with pytest.raises(ValueError, match="truncated"):
        media.mpng_info(buf[: len(buf) // 2])
    with pytest.raises(ValueError, match="truncated"):
        media.mpng_info(buf[:8])
