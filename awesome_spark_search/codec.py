"""Delta + VByte posting compression, numpy-vectorized, plus block-max metadata.

Wire format matches the reference semantics: little-endian 7-bit varints with
0x80 continuation on non-final bytes (ref: src/io/index/CompressedIndexWriter
.java:24-39), docID/position gaps delta-encoded over the sorted list
(ref: src/postings/TokenPostings.java:239-243, positions
EagerPositionMap.java:162-171). Used inside pandas UDFs — every function here
is array-at-a-time numpy (no per-element Python loops over data; the only
loops are over the ≤10 byte positions of a varint).

Block-max: postings are split into fixed blocks of ``BLOCK`` entries; per block
we store the max of the BM25 tf-normalization term tf/(tf + k1*(1-b+b*dl/avgdl))
so the query side can bound a block's score by idf * block_max (block-max WAND).
"""

from __future__ import annotations

import numpy as np

BLOCK = 128


def _vbyte_encode_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Vectorized varint encode; also returns the byte offset of EVERY value
    (exclusive cumsum of per-value byte lengths)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    # exact byte length per value: 1 + #thresholds passed
    lengths = np.ones(v.size, dtype=np.int64)
    for k in range(1, 10):
        lengths += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    offsets = np.zeros(v.size, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    out = np.zeros(int(lengths.sum()), dtype=np.uint8)
    for k in range(10):
        mask = lengths > k
        if not mask.any():
            break
        idx = offsets[mask] + k
        byte = (v[mask] >> np.uint64(7 * k)).astype(np.uint64) & np.uint64(0x7F)
        cont = np.where(lengths[mask] - 1 > k, 0x80, 0).astype(np.uint8)
        out[idx] = byte.astype(np.uint8) | cont
    return out.tobytes(), offsets


def vbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varint encode of a uint64 array."""
    return _vbyte_encode_with_offsets(values)[0]


def vbyte_encode_blocked(values: np.ndarray, block: int = BLOCK) -> tuple[bytes, np.ndarray]:
    """varint encode + the byte offset of each ``block``-aligned value: the
    slice ``buf[off[i]:off[i+1]]`` (end = len(buf) for the last block) decodes
    standalone via ``vbyte_decode`` — the block directory of the packed index
    (ref skipping-areas analog: src/io/index/UncompressedIndexWriter.java:
    101-118)."""
    buf, offsets = _vbyte_encode_with_offsets(values)
    return buf, offsets[::block].copy()


def vbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varint decode -> uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    n_values = int(is_last.sum())
    value_id = np.zeros(b.size, dtype=np.int64)
    np.cumsum(is_last[:-1], out=value_id[1:])
    starts = np.zeros(n_values, dtype=np.int64)
    last_pos = np.flatnonzero(is_last)
    starts[1:] = last_pos[:-1] + 1
    pos_in_value = np.arange(b.size, dtype=np.int64) - starts[value_id]
    vals = np.zeros(n_values, dtype=np.uint64)
    np.bitwise_or.at(
        vals, value_id, (b & np.uint8(0x7F)).astype(np.uint64) << (np.uint64(7) * pos_in_value.astype(np.uint64))
    )
    return vals


def delta_vbyte_encode(sorted_values: np.ndarray) -> bytes:
    """Gap-encode a strictly-increasing int array, then varint-pack."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b""
    gaps = np.empty(v.size, dtype=np.uint64)
    gaps[0] = np.uint64(v[0])
    gaps[1:] = np.diff(v).astype(np.uint64)
    return vbyte_encode(gaps)


def delta_vbyte_decode(buf: bytes) -> np.ndarray:
    gaps = vbyte_decode(buf)
    if gaps.size == 0:
        return np.zeros(0, dtype=np.int64)
    return np.cumsum(gaps.astype(np.int64))


def delta_vbyte_encode_blocked(
    sorted_values: np.ndarray, block: int = BLOCK
) -> tuple[bytes, np.ndarray, np.ndarray]:
    """Gap-encode with a RESTART at every ``block``-th entry (the gap at a
    block start is the absolute value), then varint-pack. Returns
    (bytes, per-block byte offsets, per-block first values). A block slice
    ``buf[off[i]:off[i+1]]`` decodes standalone as vbyte_decode + cumsum —
    no earlier block needed (skip-capable posting blobs)."""
    v = np.asarray(sorted_values, dtype=np.int64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    gaps = np.empty(v.size, dtype=np.uint64)
    gaps[0] = np.uint64(v[0])
    gaps[1:] = np.diff(v).astype(np.uint64)
    starts = np.arange(0, v.size, block, dtype=np.int64)
    gaps[starts] = v[starts].astype(np.uint64)  # restart: absolute at block head
    buf, offsets = _vbyte_encode_with_offsets(gaps)
    return buf, offsets[starts].copy(), v[starts].copy()


def cumsum_block_restart(gaps: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """Gap stream -> values when the gap at every ``block``-th entry is
    ABSOLUTE (the restart convention of delta_vbyte_encode_blocked).
    Vectorized: one cumsum + a per-block base subtraction. The single
    source of truth for the restart convention — full decode and the
    partial (block-slice) decode in wand both call it."""
    gaps = np.asarray(gaps, dtype=np.int64)
    n = gaps.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    cum = np.cumsum(gaps)
    starts = np.arange(0, n, block, dtype=np.int64)
    # value[i] = cum[i] - cum[start_of_block(i) - 1]  (0 for the first block)
    base = np.zeros(starts.size, dtype=np.int64)
    base[1:] = cum[starts[1:] - 1]
    sizes = np.diff(np.append(starts, n))
    return cum - np.repeat(base, sizes)


def delta_vbyte_decode_blocked(buf: bytes, block: int = BLOCK) -> np.ndarray:
    """Full decode of a block-restarted delta stream (inverse of
    ``delta_vbyte_encode_blocked``)."""
    return cumsum_block_restart(vbyte_decode(buf), block)


def decode_block_slice(buf: bytes, off: np.ndarray, i: int, j: int) -> np.ndarray:
    """Decode blocks [i, j) of a blocked stream: one varint pass over the
    byte slice. For delta-restarted streams follow with a per-block cumsum
    (``delta_vbyte_decode_blocked`` on the slice does exactly that)."""
    end = int(off[j]) if j < len(off) else len(buf)
    return vbyte_decode(buf[int(off[i]): end])


def block_max_scores(tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    """Per-block max of the BM25 tf-normalization term (idf excluded — it is a
    per-term scalar multiplied in at query time)."""
    tfs = np.asarray(tfs, dtype=np.float64)
    dls = np.asarray(dls, dtype=np.float64)
    norm = tfs / (tfs + k1 * (1.0 - b + b * dls / avgdl))
    n_blocks = (norm.size + BLOCK - 1) // BLOCK
    out = np.zeros(n_blocks, dtype=np.float64)
    for i in range(n_blocks):
        out[i] = norm[i * BLOCK : (i + 1) * BLOCK].max()
    return out
