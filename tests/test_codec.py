"""Posting codec: round-trip property on FIXTURES.md §5 cases + hypothesis."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from go_dcp_elasticsearch_spark.functions.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)

FIXTURE_LISTS = [
    [],
    [0],
    [5],
    list(range(BLOCK_SIZE)),  # exactly one block
    list(range(BLOCK_SIZE + 1)),  # block + 1
    [1, 2, 3, 2**28 + 7, 2**40 + 11, 2**40 + 12],  # large gaps
    list(range(1, 400)),  # all-gaps-1
]


def test_varbyte_roundtrip_fixtures():
    for vals in FIXTURE_LISTS:
        arr = np.array(vals, dtype=np.uint64)
        assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert varbyte_decode(varbyte_encode(arr)).tolist() == vals


def test_postings_roundtrip_and_blockmax():
    rng = np.random.RandomState(42)
    doc_ids = np.unique(rng.randint(0, 10**9, size=1000)).astype(np.uint64)
    tfs = rng.randint(1, 50, size=len(doc_ids)).astype(np.uint64)
    blocks = encode_postings(doc_ids, tfs)
    assert len(blocks) == (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    got_ids, got_tfs = [], []
    for b in blocks:
        ids, t = decode_block(b["ids_vb"], b["tfs_vb"])
        got_ids.extend(ids.tolist())
        got_tfs.extend(t.tolist())
        s = b["block_id"] * BLOCK_SIZE
        e = s + b["count"]
        assert b["max_tf"] == int(tfs[s:e].max())
        assert b["max_doc_id"] == int(doc_ids[s:e].max())
    assert got_ids == doc_ids.tolist()
    assert got_tfs == tfs.tolist()


def test_empty_postings():
    assert encode_postings(np.array([], dtype=np.uint64), np.array([], dtype=np.uint64)) == []


def test_encode_blocks_bulk_matches_per_block():
    from go_dcp_elasticsearch_spark.functions.codec import encode_blocks_bulk

    rng = np.random.RandomState(7)
    ids = np.unique(rng.randint(0, 10**8, size=777)).astype(np.uint64)
    tfs = rng.randint(1, 99, size=len(ids)).astype(np.uint64)
    dls = rng.randint(10, 500, size=len(ids)).astype(np.uint64)
    bulk = encode_blocks_bulk(ids, tfs, dls)
    ref = encode_postings(ids, tfs)
    assert len(bulk) == len(ref)
    for (ids_vb, tfs_vb, dls_vb, cnt, max_id, max_tf, tf_sum), r in zip(bulk, ref):
        assert ids_vb == r["ids_vb"] and tfs_vb == r["tfs_vb"]
        assert cnt == r["count"] and max_id == r["max_doc_id"] and max_tf == r["max_tf"]
        s = r["block_id"] * BLOCK_SIZE
        assert tf_sum == int(tfs[s : s + cnt].sum())
        assert varbyte_decode(dls_vb).tolist() == dls[s : s + cnt].tolist()
    assert encode_blocks_bulk(np.array([]), np.array([]), np.array([])) == []


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**50),   # id gap
            st.integers(min_value=1, max_value=2**20),   # tf
            st.integers(min_value=0, max_value=2**20),   # dl extra over tf
        ),
        min_size=1, max_size=400,
    )
)
def test_encode_blocks_bulk_property(rows):
    """Fuzz the block encoder end-to-end: decode every block back and
    verify the payloads AND the block-max metadata the WAND pruner trusts
    (count, max_doc_id, max_tf, tf_sum) plus the _first_varint fast path
    the shard splitter uses to place blocks without decoding."""
    from go_dcp_elasticsearch_spark.functions.codec import encode_blocks_bulk
    from go_dcp_elasticsearch_spark.sources.changes import _first_varint

    gaps = np.array([r[0] for r in rows], dtype=np.uint64)
    ids = (np.cumsum(gaps + 1) - 1).astype(np.uint64)  # strictly increasing
    tfs = np.array([r[1] for r in rows], dtype=np.uint64)
    dls = tfs + np.array([r[2] for r in rows], dtype=np.uint64)

    got_ids, got_tfs, got_dls = [], [], []
    off = 0
    for ids_vb, tfs_vb, dls_vb, cnt, max_id, max_tf, tf_sum in encode_blocks_bulk(
        ids, tfs, dls
    ):
        b_ids = np.cumsum(varbyte_decode(ids_vb), dtype=np.uint64)
        b_tfs = varbyte_decode(tfs_vb)
        b_dls = varbyte_decode(dls_vb)
        assert len(b_ids) == len(b_tfs) == len(b_dls) == cnt <= BLOCK_SIZE
        assert int(b_ids[-1]) == int(max_id)
        assert int(b_tfs.max()) == int(max_tf)
        assert int(b_tfs.sum()) == int(tf_sum)
        assert _first_varint(ids_vb) == int(b_ids[0])
        got_ids.append(b_ids); got_tfs.append(b_tfs); got_dls.append(b_dls)
        off += cnt
    assert off == len(ids)
    assert np.concatenate(got_ids).tolist() == ids.tolist()
    assert np.concatenate(got_tfs).tolist() == tfs.tolist()
    assert np.concatenate(got_dls).tolist() == dls.tolist()


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=1000),    # tf
            st.integers(min_value=0, max_value=5000),    # dl extra over tf
        ),
        min_size=1, max_size=BLOCK_SIZE,
    ),
    st.floats(min_value=0.5, max_value=5000.0),          # avgdl
)
def test_block_ub_is_sound_property(rows, avgdl):
    """WAND soundness invariant: the per-block upper bound computed from
    (max_tf, min_dl) under ANY query-time avgdl must dominate the true
    tf-normalization of every posting in the block — an unsound bound
    silently drops true top-k docs."""
    from go_dcp_elasticsearch_spark.functions.bm25 import B, K1
    from go_dcp_elasticsearch_spark.index.query import _block_ub

    tfs = np.array([r[0] for r in rows], dtype=np.float64)
    dls = tfs + np.array([r[1] for r in rows], dtype=np.float64)
    ub = _block_ub(float(tfs.max()), float(dls.min()), avgdl)
    tfn = tfs / (tfs + K1 * (1.0 - B + B * dls / avgdl))
    assert (tfn <= ub + 1e-12).all()


def test_encode_blocks_grouped_matches_per_group_bulk():
    """r7: the cross-group bulk encoder must be BYTE-IDENTICAL to calling
    encode_blocks_bulk per (term, shard) group — it is what the chunk
    kernels write, so any divergence changes the on-disk index."""
    from go_dcp_elasticsearch_spark.functions.codec import (
        encode_blocks_bulk,
        encode_blocks_grouped,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        starts, ends, parts = [], [], []
        pos = 0
        for _g in range(int(rng.integers(1, 30))):
            m = int(rng.integers(1, 3 * BLOCK_SIZE + 1))
            ids = np.sort(
                rng.choice(10**6, size=m, replace=False)
            ).astype(np.uint64)
            starts.append(pos)
            ends.append(pos + m)
            pos += m
            parts.append((
                ids,
                rng.integers(1, 300, m).astype(np.uint64),
                rng.integers(1, 5000, m).astype(np.uint64),
            ))
        dids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        blk = encode_blocks_grouped(
            np.array(starts), np.array(ends), dids, tfs, dls
        )
        i = 0
        for s, e in zip(starts, ends):
            mindl = np.minimum.reduceat(
                dls[s:e].astype(np.int64), np.arange(0, e - s, BLOCK_SIZE)
            )
            for bi, (ids_vb, tfs_vb, dls_vb, cnt, max_id, max_tf,
                     tf_sum) in enumerate(
                encode_blocks_bulk(dids[s:e], tfs[s:e], dls[s:e])
            ):
                assert blk["ids_vb"][i] == ids_vb
                assert blk["tfs_vb"][i] == tfs_vb
                assert blk["dls_vb"][i] == dls_vb
                assert blk["count"][i] == cnt
                assert blk["max_doc_id"][i] == max_id
                assert blk["max_tf"][i] == max_tf
                assert blk["tf_sum"][i] == tf_sum
                assert blk["min_dl"][i] == int(mindl[bi])
                assert blk["block_ord"][i] == bi
                assert blk["first_doc_id"][i] == int(
                    dids[s + bi * BLOCK_SIZE]
                )
                i += 1
        assert i == len(blk["bstarts"])
