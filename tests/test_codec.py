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
