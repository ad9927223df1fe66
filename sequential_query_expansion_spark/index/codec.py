"""Varint (LEB128) posting-block codec, vectorized in numpy.

Reference stores postings as Indri's compressed inverted file
(occuranceCount.cpp:317-351 iterates `DocListIterator` entries
`(document, positions[])`). We re-express that as docID-delta + varint
block compression inside binary columns (BASELINE.json north_star).

Both directions are numpy-vectorized (no per-value Python loop):
- encode: per-value byte-length computed from bit_length; bytes emitted
  column-wise into an (n, 10) staging array, gathered by a length mask.
- decode: continuation bits located with a boolean mask; each byte's
  7-bit payload shifted by its position within its value-group and
  scatter-added.

Round-trip is exactly invertible for any uint64 array (property-tested
with hypothesis in tests/test_codec.py).
"""

from __future__ import annotations

import numpy as np

_MAX_BYTES = 10  # ceil(64 / 7)


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


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray):
    """One posting block -> (docs_bytes, tfs_bytes, dls_bytes)."""
    return (
        varint_encode(delta_encode(doc_ids)),
        varint_encode(tfs.astype(np.uint64)),
        varint_encode(dls.astype(np.uint64)),
    )


def decode_block(docs_b: bytes, tfs_b: bytes, dls_b: bytes, n: int):
    """-> (doc_ids int64, tfs int64, dls int64)."""
    doc_ids = delta_decode(varint_decode(docs_b, n))
    tfs = varint_decode(tfs_b, n).astype(np.int64)
    dls = varint_decode(dls_b, n).astype(np.int64)
    return doc_ids, tfs, dls
