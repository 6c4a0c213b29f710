"""Posting-list compression: delta-gap + variable-byte block encoding with
block-max metadata (SURVEY.md B8).

The reference leaves compression to Elasticsearch/Lucene (FOR/PForDelta are
internal to the sink); its own wire-level compression is optional gzip of
the bulk request body (elasticsearch/client/client.go:22). Our engine owns
the index, so it owns the codec.

Layout per (term, shard):
  doc_ids sorted ascending -> split into blocks of BLOCK_SIZE ->
  per block: delta-gap (first id absolute, rest gaps) -> varbyte bytes.
  tfs stored varbyte per block (no delta; tfs are small).
  Block-max metadata: max tf within block + max doc_id (skip pointers) ->
  enables Block-Max WAND pruning at query time (B10).

All encode/decode is numpy-vectorized — this runs inside pandas UDFs over
Arrow batches, never per-row Python.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized varbyte (LEB128-ish, 7 bits/byte, MSB = continuation)."""
    if len(values) == 0:
        return b""
    v = np.asarray(values, dtype=np.uint64)
    # exact byte length per value: 1 + number of nonzero 7-bit shifts
    lengths = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    # write groups least-significant-first, continuation bit on all but last
    offsets = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    work = v.copy()
    max_len = int(lengths.max())
    for i in range(max_len):
        mask = lengths > i
        pos = offsets[mask] + i
        byte = (work[mask] & np.uint64(0x7F)).astype(np.uint8)
        cont = (i < (lengths[mask] - 1)).astype(np.uint8) << 7
        out[pos] = byte | cont
        work[mask] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Vectorized varbyte decode."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    is_last = (raw & 0x80) == 0
    # value boundaries: each value ends at a byte with MSB clear
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = len(ends)
    values = np.zeros(n, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    payload = (raw & 0x7F).astype(np.uint64)
    for i in range(max_len):
        pos = starts + i
        mask = pos <= ends
        values[mask] |= payload[pos[mask]] << np.uint64(7 * i)
    return values


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Exact encoded byte length per value (1 + #nonzero 7-bit shifts)."""
    v = np.asarray(values, dtype=np.uint64)
    lengths = np.ones(len(v), dtype=np.int64)
    tmp = v >> np.uint64(7)
    while tmp.any():
        lengths += (tmp > 0).astype(np.int64)
        tmp >>= np.uint64(7)
    return lengths


def encode_blocks_bulk(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> list[tuple[bytes, bytes, bytes, int, int, int, int]]:
    """Encode one term's full posting list in THREE varbyte passes total
    (ids/tfs/dls), then slice per-block byte ranges from the concatenated
    buffers — O(1) numpy calls per list instead of O(blocks).

    Gaps reset at block boundaries (each block's first id is absolute) so
    blocks stay independently decodable. Returns per-block tuples:
    (ids_vb, tfs_vb, dls_vb, count, max_doc_id, max_tf, tf_sum).
    """
    n = len(doc_ids)
    if n == 0:
        return []
    ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    dls = np.asarray(dls, dtype=np.uint64)
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    starts = np.arange(0, n, block_size)
    gaps[starts] = ids[starts]  # absolute first id per block

    out = []
    bufs = []
    offs = []
    for arr in (gaps, tfs, dls):
        lens = varbyte_lengths(arr)
        cum = np.concatenate(([0], np.cumsum(lens)))
        bufs.append(varbyte_encode(arr))
        offs.append(cum)
    for b, s in enumerate(starts):
        e = min(s + block_size, n)
        ids_vb = bufs[0][offs[0][s] : offs[0][e]]
        tfs_vb = bufs[1][offs[1][s] : offs[1][e]]
        dls_vb = bufs[2][offs[2][s] : offs[2][e]]
        tf_blk = tfs[s:e]
        out.append(
            (
                ids_vb,
                tfs_vb,
                dls_vb,
                int(e - s),
                int(ids[e - 1]),
                int(tf_blk.max()),
                int(tf_blk.sum()),
            )
        )
    return out


def encode_blocks_grouped(
    group_starts: np.ndarray,
    group_ends: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode MANY groups' posting lists in O(1) numpy passes over the
    whole partition (r7): the per-group ``encode_blocks_bulk`` call chain
    cost ~0.3 ms of numpy-dispatch overhead per (term, shard) group, and a
    code corpus has millions of mostly-tiny groups — per-GROUP overhead,
    not per-posting work, dominated the build kernel profile.

    ``group_starts``/``group_ends`` must tile [0, n) contiguously
    (``group_ends[i] == group_starts[i+1]``), with ids sorted ascending
    within each group — exactly the boundary arrays the chunk kernels
    already derive from their lexsort. Byte-identical to calling
    ``encode_blocks_bulk`` per group: varbyte is a per-value code, so one
    encode pass over the concatenation slices into the same per-block
    byte strings.

    Returns columnar arrays over ALL blocks, in group order:
      {"bstarts": block start index into the input arrays,
       "block_ord": per-group block ordinal,
       "count", "first_doc_id", "max_doc_id", "max_tf", "tf_sum", "min_dl",
       "ids_vb", "tfs_vb", "dls_vb": lists of per-block bytes}
    """
    n = len(doc_ids)
    empty = np.empty(0, dtype=np.int64)
    if n == 0:
        return {
            "bstarts": empty, "block_ord": empty, "count": empty,
            "first_doc_id": empty, "max_doc_id": empty, "max_tf": empty,
            "tf_sum": empty, "min_dl": empty,
            "ids_vb": [], "tfs_vb": [], "dls_vb": [],
        }
    ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs_u = np.asarray(tfs, dtype=np.uint64)
    dls_u = np.asarray(dls, dtype=np.uint64)
    g_starts = np.asarray(group_starts, dtype=np.int64)
    g_ends = np.asarray(group_ends, dtype=np.int64)
    lens = g_ends - g_starts
    # block boundaries: every position whose offset within its group is a
    # multiple of block_size starts a block
    off = np.arange(n, dtype=np.int64) - np.repeat(g_starts, lens)
    block_ord_all = off // block_size
    bstart_mask = (off % block_size) == 0
    bstarts = np.nonzero(bstart_mask)[0]
    blocks_per_group = -(-lens // block_size)
    g_of_block = np.repeat(np.arange(len(g_starts)), blocks_per_group)
    bends = np.minimum(bstarts + block_size, g_ends[g_of_block])

    # delta gaps, reset to the absolute id at every block start
    gaps = np.empty_like(ids)
    gaps[0] = ids[0]
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    gaps[bstarts] = ids[bstarts]

    # ONE varbyte pass per stream over the whole partition, then per-block
    # byte-range slices (identical bytes: varbyte encodes values
    # independently)
    slices = []
    for arr in (gaps, tfs_u, dls_u):
        lens_b = varbyte_lengths(arr)
        cum = np.concatenate(([0], np.cumsum(lens_b)))
        slices.append((varbyte_encode(arr), cum))
    # contiguous tiling makes [bstarts[i], bstarts[i+1]) == block i, so
    # ufunc.reduceat over bstarts reduces exactly per block
    return {
        "bstarts": bstarts,
        "block_ord": block_ord_all[bstarts],
        "count": (bends - bstarts).astype(np.int64),
        "first_doc_id": ids[bstarts].astype(np.int64),
        "max_doc_id": ids[bends - 1].astype(np.int64),
        "max_tf": np.maximum.reduceat(tfs_u, bstarts).astype(np.int64),
        "tf_sum": np.add.reduceat(tfs_u, bstarts).astype(np.int64),
        "min_dl": np.minimum.reduceat(dls_u, bstarts).astype(np.int64),
        "ids_vb": [slices[0][0][slices[0][1][s]:slices[0][1][e]]
                   for s, e in zip(bstarts, bends)],
        "tfs_vb": [slices[1][0][slices[1][1][s]:slices[1][1][e]]
                   for s, e in zip(bstarts, bends)],
        "dls_vb": [slices[2][0][slices[2][1][s]:slices[2][1][e]]
                   for s, e in zip(bstarts, bends)],
    }


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> list[dict]:
    """Split one term's postings into compressed blocks.

    Returns a list of dicts: one row per block, ready to become rows of the
    ``postings`` table:
      {block_id, ids_vb: bytes, tfs_vb: bytes, count, max_doc_id, max_tf}
    ``doc_ids`` must be sorted ascending and unique.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    blocks = []
    for b, start in enumerate(range(0, len(doc_ids), BLOCK_SIZE)):
        ids = doc_ids[start : start + BLOCK_SIZE]
        t = tfs[start : start + BLOCK_SIZE]
        gaps = np.empty_like(ids)
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        blocks.append(
            {
                "block_id": b,
                "ids_vb": varbyte_encode(gaps),
                "tfs_vb": varbyte_encode(t),
                "count": int(len(ids)),
                "max_doc_id": int(ids[-1]),
                "max_tf": int(t.max()),
            }
        )
    return blocks


def decode_block(ids_vb: bytes, tfs_vb: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of one block of encode_postings -> (doc_ids, tfs)."""
    gaps = varbyte_decode(ids_vb)
    ids = np.cumsum(gaps, dtype=np.uint64)
    tfs = varbyte_decode(tfs_vb)
    return ids, tfs
