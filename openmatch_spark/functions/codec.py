"""Posting-list compression: delta + variable-byte encoding (north_rule F14).

Vectorized numpy encode/decode — runs inside applyInPandas during index build
and inside the WAND scorer at query time. No per-element Python loops on the
hot path: varbyte encode/decode is done with numpy byte-matrix tricks.

docIDs inside a posting block are strictly increasing ints (we map string
doc ids to dense int64 ordinals at build time; the dictionary maps back), so
delta gaps are >= 1 and varbyte bytes per gap stay small for dense lists.
"""

from __future__ import annotations

import numpy as np


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int64 array -> first value + gaps."""
    a = np.asarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a
    out = np.empty_like(a)
    out[0] = a[0]
    np.subtract(a[1:], a[:-1], out=out[1:])
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(gaps, dtype=np.int64))


def _varbyte_parts(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """(encoded buffer, per-value byte count) — shared by the single-block and
    batched encoders so any contiguous value range can be sliced back out of
    the buffer by byte offset."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    # bytes needed per value: ceil(bitlen/7), min 1
    bitlen = np.zeros(v.shape, dtype=np.int64)
    # bit_length via log2 on float is unsafe for >2**53; use frexp-free shift loop
    tmp = v.copy()
    while np.any(tmp > 0):
        bitlen[tmp > 0] += 1
        tmp >>= np.uint64(1)
    nbytes = np.maximum((bitlen + 6) // 7, 1)
    maxb = int(nbytes.max())
    # matrix[i, j] = j-th 7-bit group (little-endian groups)
    shifts = (np.arange(maxb, dtype=np.uint64) * np.uint64(7))[None, :]
    groups = ((v[:, None] >> shifts) & np.uint64(0x7F)).astype(np.uint8)
    mask = np.arange(maxb)[None, :] < nbytes[:, None]
    # continuation bit on every byte except the last of each value
    last = np.arange(maxb)[None, :] == (nbytes[:, None] - 1)
    groups[mask & ~last] |= 0x80
    return groups[mask].tobytes(), nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Unsigned varbyte (LEB128-style, continuation bit 0x80 on non-final).

    Vectorized: compute byte-length per value, scatter 7-bit groups into a
    ragged byte matrix, compress out the unused slots.
    """
    return _varbyte_parts(values)[0]


def encode_blocks_batch(
    ords: np.ndarray, weights: np.ndarray, block_starts: np.ndarray
) -> dict:
    """Encode MANY posting blocks in one vectorized pass.

    ords/weights are flat arrays covering all blocks back-to-back;
    block_starts[i] is the index where block i begins (block i ends at
    block_starts[i+1], the last at len(ords)). Delta encoding resets at each
    block start (the first ord of a block is stored raw), so every block's
    payload decodes independently with decode_postings — byte-identical to
    encoding each block separately, at O(total postings) numpy cost instead
    of O(blocks) python calls (the old per-block UDF spent ~40us of numpy
    fixed overhead on every ~6-posting tail-term block).
    """
    ords = np.asarray(ords, dtype=np.int64)
    weights = np.asarray(weights, dtype=np.float64)
    starts = np.asarray(block_starts, dtype=np.int64)
    nb = starts.shape[0]
    if nb == 0:
        return {"first_ord": [], "last_ord": [], "n": [], "max_score": [],
                "docs": [], "scores": []}
    ends = np.empty(nb, dtype=np.int64)
    ends[:-1] = starts[1:]
    ends[-1] = ords.shape[0]

    deltas = np.empty_like(ords)
    deltas[1:] = ords[1:] - ords[:-1]
    deltas[starts] = ords[starts]  # raw first value per block (delta reset)
    buf, nbytes = _varbyte_parts(deltas)
    byte_off = np.zeros(ords.shape[0] + 1, dtype=np.int64)
    np.cumsum(nbytes, out=byte_off[1:])
    b0, b1 = byte_off[starts], byte_off[ends]

    wbuf = weights.tobytes()
    return {
        "first_ord": ords[starts],
        "last_ord": ords[ends - 1],
        "n": (ends - starts).astype(np.int32),
        "max_score": np.maximum.reduceat(weights, starts),
        "docs": [buf[s:e] for s, e in zip(b0.tolist(), b1.tolist())],
        "scores": [wbuf[8 * s : 8 * e] for s, e in zip(starts.tolist(), ends.tolist())],
    }


def encode_sequences_batch(values: np.ndarray, starts: np.ndarray) -> list[bytes]:
    """delta+varbyte encode MANY independent strictly-increasing sequences
    in one vectorized pass (delta resets at each start, first value raw) —
    the positions-payload sibling of encode_blocks_batch. Each returned
    payload decodes independently with decode_postings."""
    values = np.asarray(values, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    if starts.size == 0:
        return []
    ends = np.empty_like(starts)
    ends[:-1] = starts[1:]
    ends[-1] = values.shape[0]
    deltas = np.empty_like(values)
    deltas[1:] = values[1:] - values[:-1]
    deltas[starts] = values[starts]
    buf, nbytes = _varbyte_parts(deltas)
    off = np.zeros(values.shape[0] + 1, dtype=np.int64)
    np.cumsum(nbytes, out=off[1:])
    b0, b1 = off[starts], off[ends]
    return [buf[s:e] for s, e in zip(b0.tolist(), b1.tolist())]


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Inverse of varbyte_encode, vectorized via cumulative group positions."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.int64)
    is_last = (b & 0x80) == 0
    value_idx = np.zeros(b.size, dtype=np.int64)
    value_idx[1:] = np.cumsum(is_last)[:-1]
    # position of byte within its value = index - first_byte_index_of_value
    starts = np.zeros(b.size, dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    start_pos = np.flatnonzero(starts)
    within = np.arange(b.size) - np.repeat(start_pos, np.diff(np.append(start_pos, b.size)))
    vals7 = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * within.astype(np.uint64))
    out = np.zeros(int(is_last.sum()), dtype=np.uint64)
    np.add.at(out, value_idx, vals7)
    return out.astype(np.int64)


def encode_postings(doc_ords: np.ndarray) -> bytes:
    """delta + varbyte in one call (block payload)."""
    return varbyte_encode(delta_encode(doc_ords))


def decode_postings(buf: bytes) -> np.ndarray:
    return delta_decode(varbyte_decode(buf))
