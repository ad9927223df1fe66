"""Posting-block codecs (varint/LEB128 and PForDelta), vectorized in numpy.

Reference stores postings as Indri's compressed inverted file
(occuranceCount.cpp:317-351 iterates `DocListIterator` entries
`(document, positions[])`). We re-express that as docID-delta +
varint/PForDelta block compression inside binary columns (BASELINE.json
north_star names both; either is selectable per build via
``encode_block(codec=...)``, and every encoded buffer carries a one-byte
codec tag so ``decode_block`` is self-describing).

Varint — both directions numpy-vectorized (no per-value Python loop):
- encode: per-value byte-length computed from bit_length; bytes emitted
  column-wise into an (n, 10) staging array, gathered by a length mask.
- decode: continuation bits located with a boolean mask; each byte's
  7-bit payload shifted by its position within its value-group and
  scatter-added.

PForDelta (NewPFD-style) — frame-of-reference bit packing + patching:
- a bit width ``b`` is chosen per block to minimize encoded size; values
  < 2^b are bit-packed LSB-first (np.packbits); the rest become
  exceptions, stored as (varint position-deltas, varint high bits) and
  patched back after unpacking. Block-sized inputs (128 postings) make
  the width search trivial (≤ 64 candidate widths, fully vectorized).

Round-trips are exactly invertible for any uint64 array (property-tested
with hypothesis in tests/test_codec.py), and the WAND path is
rank-identical under either codec (tests/test_wand.py).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)

# one-byte buffer tags (first byte of every encode_block output buffer)
TAG_VARINT = 0x56  # 'V'
TAG_PFOR = 0x50    # 'P'

CODECS = ("varint", "pfor")

# bump when the on-disk buffer layout changes; stamped into stats.json by
# the checkpointed build and checked by load_index.
#   1 = untagged varint (unreadable by the tag-dispatching decoder)
#   2 = tagged buffers, pfor header '<BHH' (u16 exception counts)
#   3 = tagged buffers, pfor header '<BII' (u32 counts — current)
BLOCK_FORMAT = 3


def varint_encode(values: np.ndarray) -> bytes:
    """uint64 array -> LEB128 bytes."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return b""
    out = np.zeros((n, _MAX_BYTES), dtype=np.uint8)
    lengths = np.ones(n, dtype=np.int64)
    v = a.copy()
    for i in range(_MAX_BYTES):
        byte = (v & np.uint64(0x7F)).astype(np.uint8)
        v >>= np.uint64(7)
        more = v > 0
        out[:, i] = byte | (more.astype(np.uint8) << 7)
        lengths[more] = i + 2
        if not more.any():
            break
    mask = np.arange(_MAX_BYTES) < lengths[:, None]
    return out[mask].tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """LEB128 bytes -> uint64 array of ``count`` values."""
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    arr = np.frombuffer(buf, dtype=np.uint8)
    payload = (arr & 0x7F).astype(np.uint64)
    is_last = (arr & 0x80) == 0
    ends = np.flatnonzero(is_last)
    if len(ends) != count:
        raise ValueError(f"expected {count} varints, found {len(ends)}")
    gid = np.zeros(len(arr), dtype=np.int64)
    gid[1:] = np.cumsum(is_last)[:-1]
    starts = np.zeros(count, dtype=np.int64)
    starts[1:] = ends[:-1] + 1
    pos = np.arange(len(arr)) - starts[gid]
    vals = np.zeros(count, dtype=np.uint64)
    np.add.at(vals, gid, payload << (np.uint64(7) * pos.astype(np.uint64)))
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 ids -> first value + gaps (uint64)."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    out = np.empty(len(a), dtype=np.uint64)
    if len(a):
        out[0] = np.uint64(a[0])
        out[1:] = np.diff(a).astype(np.uint64)
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64), dtype=np.int64)


def _bit_lengths(vals: np.ndarray) -> np.ndarray:
    """Per-value bit length of a uint64 array.

    Fast path: ``np.frexp`` exponents — exact for values < 2^53 (every
    float64 conversion is exact there), one vector op instead of the
    6-pass shift cascade. Values >= 2^53 (never real doc-gaps, but the
    codec must stay correct for ANY uint64 — hypothesis round-trips) fall
    back to the shift cascade, where float rounding could otherwise
    overstate the exponent near powers of two."""
    big = vals >= np.uint64(1) << np.uint64(53)
    if big.any():
        bl = np.zeros(len(vals), dtype=np.int64)
        v = vals.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            m = v >= np.uint64(1) << np.uint64(shift)
            bl[m] += shift
            v[m] >>= np.uint64(shift)
        bl += (v > 0).astype(np.int64)
        return bl
    return np.frexp(vals.astype(np.float64))[1].astype(np.int64)


def _pack_bits(vals: np.ndarray, b: int) -> bytes:
    """Bit-pack n values (< 2^b each) LSB-first into ceil(n*b/8) bytes."""
    if b == 0 or len(vals) == 0:
        return b""
    shifts = np.arange(b, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bits(buf: bytes, n: int, b: int) -> np.ndarray:
    if b == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * b, bitorder="little"
    )
    shifts = np.arange(b, dtype=np.uint64)
    return (bits.reshape(n, b).astype(np.uint64) << shifts).sum(
        axis=1, dtype=np.uint64
    )


_WIDTHS = np.arange(65, dtype=np.int64)
# precomputed per-(width b, bit length l) exception cost in bytes:
# ceil((l-b)/7) high-bit bytes + 1 position byte when l > b
_OVER = np.maximum(_WIDTHS[None, :] - _WIDTHS[:, None], 0)  # [b, l] = l-b
_EXC_COST = (-(-_OVER // 7) + (_OVER > 0)).astype(np.int64)


def _choose_width(bit_lens: np.ndarray) -> int:
    """Width minimizing packed bytes + exception bytes. The search runs
    over the 65-bin HISTOGRAM of bit lengths (one matvec against the
    precomputed (b, l) exception-cost table), not the value vector —
    O(65²) regardless of block size."""
    n = len(bit_lens)
    hist = np.bincount(bit_lens, minlength=65)
    cost = (n * _WIDTHS + 7) // 8 + _EXC_COST @ hist
    return int(cost.argmin())


def pfor_encode(values: np.ndarray) -> bytes:
    """uint64 array -> PForDelta frame: header(b:u8, n_exc:u32,
    pos_len:u32) + packed low bits + varint exception position-deltas +
    varint high bits. u32 counts keep the codec valid for ANY array
    length (the block writer only ever passes 128-value blocks, but the
    positions/other callers must not silently overflow a u16)."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return struct.pack("<BII", 0, 0, 0)
    bl = _bit_lengths(a)
    b = _choose_width(bl)
    if b >= 64:
        low, exc_idx = a, np.zeros(0, dtype=np.int64)
    else:
        mask = (np.uint64(1) << np.uint64(b)) - np.uint64(1)
        low = a & mask
        exc_idx = np.flatnonzero(bl > b)
    packed = _pack_bits(low, b)
    if len(exc_idx):
        # ONE varint pass over [position-deltas..., high-bits...]: the
        # two streams are adjacent in the buffer, so encoding their
        # concatenation yields byte-identical output to two separate
        # calls; the header's pos_len (the split point old readers use)
        # is recovered from the n_exc-th terminator byte.
        tail_vals = np.concatenate(
            [delta_encode(exc_idx), a[exc_idx] >> np.uint64(b)]
        )
        tail = varint_encode(tail_vals)
        tail_arr = np.frombuffer(tail, dtype=np.uint8)
        ends = np.flatnonzero((tail_arr & 0x80) == 0)
        pos_len = int(ends[len(exc_idx) - 1]) + 1
    else:
        tail, pos_len = b"", 0
    return struct.pack("<BII", b, len(exc_idx), pos_len) + packed + tail


def pfor_decode(buf: bytes, count: int) -> np.ndarray:
    b, n_exc, pos_len = struct.unpack_from("<BII", buf, 0)
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    off = 9
    packed_len = (count * b + 7) // 8
    vals = _unpack_bits(buf[off:off + packed_len], count, b)
    off += packed_len
    if n_exc:
        pos = delta_decode(varint_decode(buf[off:off + pos_len], n_exc))
        high = varint_decode(buf[off + pos_len:], n_exc)
        vals[pos] |= high << np.uint64(b)
    return vals


_ENCODERS = {"varint": (TAG_VARINT, varint_encode),
             "pfor": (TAG_PFOR, pfor_encode)}
_DECODERS = {TAG_VARINT: varint_decode, TAG_PFOR: pfor_decode}


def _encode_tagged(values: np.ndarray, codec: str) -> bytes:
    tag, enc = _ENCODERS[codec]
    return bytes([tag]) + enc(values)


def _decode_tagged(buf: bytes, count: int) -> np.ndarray:
    try:
        dec = _DECODERS[buf[0]]
    except (KeyError, IndexError):
        raise ValueError(f"unknown codec tag in posting buffer: {buf[:1]!r}")
    return dec(buf[1:], count)


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
                 codec: str = "varint"):
    """One posting block -> (docs_bytes, tfs_bytes, dls_bytes).

    Each buffer is prefixed with a one-byte codec tag, so readers never
    need to know the build-time choice (mixed-codec indexes — e.g. after
    a compact with a different setting — decode fine)."""
    return (
        _encode_tagged(delta_encode(doc_ids), codec),
        _encode_tagged(tfs.astype(np.uint64), codec),
        _encode_tagged(dls.astype(np.uint64), codec),
    )


def decode_block(docs_b: bytes, tfs_b: bytes, dls_b: bytes, n: int):
    """-> (doc_ids int64, tfs int64, dls int64)."""
    doc_ids = delta_decode(_decode_tagged(docs_b, n))
    tfs = _decode_tagged(tfs_b, n).astype(np.int64)
    dls = _decode_tagged(dls_b, n).astype(np.int64)
    return doc_ids, tfs, dls
