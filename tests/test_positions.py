"""Positional sidecar (IndexBuilder positions=True) + index-only phrase:
rank identity with the source-verify path and the pure-Python oracle,
slop composition, position round-trips, and the freshness contract
(any maintenance commit invalidates; source=None then raises).

Reference contract: Lucene/ES store positions in the postings
(``index_options: positions``, the text-field default) so match_phrase
never reads ``_source`` — this sidecar is that capability, derived at
build and invalidated (not silently served stale) by incremental
maintenance.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
from go_dcp_elasticsearch_spark.index.positions import (
    decoded_positions,
    positions_fresh,
    span_near_positions,
)
from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

N = 300


@pytest.fixture(scope="module")
def pos_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("positx") / "idx")
    corpus = synth_corpus(spark, N)
    IndexBuilder(spark, idx, n_shards=4, positions=True).build(corpus)
    docs = spark.read.parquet(f"{idx}/docs").select(
        "doc_id", "repo", "path"
    ).collect()
    src = {(r["repo"], r["path"]): r["content"] for r in corpus.collect()}
    toks = {r["doc_id"]: tokenize_py(src[(r["repo"], r["path"])]) for r in docs}
    return idx, corpus, toks


def _phrase_from(toks, length=2):
    for t in toks.values():
        for i in range(len(t) - length):
            seq = t[i : i + length]
            if len(set(seq)) == length:
                return seq
    raise AssertionError("no phrase in fixture")


def test_positions_fresh_after_build(spark, pos_idx):
    idx, _, _ = pos_idx
    assert positions_fresh(spark, idx)
    from go_dcp_elasticsearch_spark.index.builder import read_index_meta

    assert read_index_meta(spark, idx)["positions"] is True


def test_position_lists_roundtrip(spark, pos_idx):
    """Decoded position lists == token indices from the raw content."""
    idx, _, toks = pos_idx
    some = sorted({t for tt in list(toks.values())[:20] for t in tt})[:5]
    rows = decoded_positions(spark, idx, some).collect()
    assert rows, "sampled terms must exist"
    for r in rows:
        d, term, pos = int(r["doc_id"]), r["term"], list(r["pos"])
        exp = [i for i, t in enumerate(toks[d]) if t == term]
        assert pos == exp, (d, term)


@pytest.mark.parametrize("length", [2, 3])
def test_index_only_phrase_equals_source_verify(spark, pos_idx, length):
    idx, corpus, toks = pos_idx
    q = BM25Query(spark, idx)
    seq = _phrase_from(toks, length)
    text = " ".join(seq)
    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_phrase(text, 10).collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_phrase(text, 10, source=corpus).collect()]
    assert a == b and a


@pytest.mark.parametrize("slop", [0, 1, 2])
def test_index_only_phrase_slop_equals_source_verify(spark, pos_idx, slop):
    idx, corpus, toks = pos_idx
    q = BM25Query(spark, idx)
    # a gapped pair so slop provably bites
    for t in toks.values():
        if len(t) > 2 and t[0] != t[2]:
            seq = [t[0], t[2]]
            break
    text = " ".join(seq)
    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_phrase(text, 300, slop=slop).collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_phrase(text, 300, source=corpus,
                                slop=slop).collect()]
    assert a == b


def test_span_near_positions_unit():
    import numpy as np

    a = np.array([0, 10])
    b = np.array([2, 12])
    assert span_near_positions([a, b], 1)       # 0 -> 2 with one gap
    assert not span_near_positions([a, b], 0)   # no adjacent pair
    assert span_near_positions([np.array([5]), np.array([6])], 0)
    assert not span_near_positions([np.array([6]), np.array([5])], 5)
    assert not span_near_positions([np.array([]), np.array([1])], 3)


def test_staleness_and_rebuild(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 80)
    IndexBuilder(spark, idx, n_shards=2, positions=True).build(corpus)
    q = BM25Query(spark, idx)
    toks0 = tokenize_py(corpus.limit(1).collect()[0]["content"])
    text = " ".join(toks0[:2])
    assert q.topk_phrase(text, 5).count() >= 1

    # a DELTA-strategy apply invalidates the sidecar (segments carry new
    # doc_ids the sidecar never saw)
    upd = corpus.limit(2).withColumn(
        "seq_no", F.col("seq_no") + F.lit(1_000_000)
    )
    changes = upd.select("repo", "path", F.lit("index").alias("action"),
                         "seq_no")
    apply_changes_to_index(spark, idx, corpus, changes, strategy="delta")
    assert not positions_fresh(spark, idx)
    q.refresh()
    with pytest.raises(ValueError, match="FRESH positional sidecar"):
        q.topk_phrase(text, 5)
    # the source path still serves
    assert q.topk_phrase(text, 5, source=corpus).count() >= 1

    # a fresh positional build restores index-only phrase; a
    # positions=False build removes the sidecar entirely
    IndexBuilder(spark, idx, n_shards=2, positions=True).build(corpus)
    assert positions_fresh(spark, idx)
    q.refresh()
    assert q.topk_phrase(text, 5).count() >= 1
    IndexBuilder(spark, idx, n_shards=2).build(corpus)
    assert not positions_fresh(spark, idx)
    q.refresh()
    with pytest.raises(ValueError, match="FRESH positional sidecar"):
        q.topk_phrase(text, 5)


def test_rebuild_apply_maintains_positions(spark, tmp_path):
    """A rebuild-strategy apply re-derives the rebuilt shards' position
    partitions and re-stamps the marker: index-only phrase keeps serving,
    with the POST-change positions."""
    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 80)
    IndexBuilder(spark, idx, n_shards=2, positions=True).build(corpus)
    q = BM25Query(spark, idx)

    upd = corpus.limit(3).withColumn(
        "content",
        F.concat(F.lit("zzalpha zzbeta "), F.col("content")),
    ).withColumn("seq_no", F.col("seq_no") + F.lit(1_000_000))
    n_upd = upd.count()
    new_corpus = corpus.join(
        upd.select("repo", "path"), ["repo", "path"], "left_anti"
    ).unionByName(upd)
    changes = upd.select("repo", "path", F.lit("index").alias("action"),
                         "seq_no")
    out = apply_changes_to_index(
        spark, idx, new_corpus, changes, strategy="rebuild"
    )
    assert out.get("segment") is None
    assert positions_fresh(spark, idx)
    q.refresh()
    # the new phrase exists only in the updated docs' NEW content and
    # only at positions (0, 1) — index-only phrase must see it
    hits = q.topk_phrase("zzalpha zzbeta", 10)
    assert hits.count() == n_upd
    # and is position-exact: reversed order must NOT match at slop 0
    assert q.topk_phrase("zzbeta zzalpha", 10).count() == 0
    # identical to the source-verify path on the post-change corpus
    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in hits.collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_phrase("zzalpha zzbeta", 10,
                                source=new_corpus).collect()]
    assert a == b

    # a sidecar that went stale via a delta apply STAYS stale across a
    # later rebuild apply (maintenance never resurrects divergence)
    apply_changes_to_index(spark, idx, new_corpus, changes, strategy="delta")
    assert not positions_fresh(spark, idx)
    out2 = apply_changes_to_index(
        spark, idx, new_corpus, changes, strategy="rebuild"
    )
    assert out2.get("segment") is None
    assert not positions_fresh(spark, idx)


def test_positions_kernel_bulk_encode_matches_per_group_spec():
    """r7: the positions kernel encodes its three varbyte streams in one
    pass each and slices per group; rows must stay byte-identical to the
    original per-group encode (the sidecar layout is on-disk contract)."""
    from itertools import chain

    import numpy as np
    import pandas as pd

    from go_dcp_elasticsearch_spark.corpus import _gen_row
    from go_dcp_elasticsearch_spark.functions.codec import varbyte_encode
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.index.positions import (
        POSITIONS_SCHEMA,
        _positions_kernel,
    )

    def reference(iterator):
        cols = [f.name for f in POSITIONS_SCHEMA.fields]
        for pdf in iterator:
            if not len(pdf):
                continue
            pdf = pdf.sort_values("doc_id")
            toks_per_doc = [tokenize_py(c or "") for c in pdf["content"]]
            lens = np.fromiter((len(t) for t in toks_per_doc),
                               dtype=np.int64, count=len(toks_per_doc))
            total = int(lens.sum())
            if total == 0:
                continue
            all_toks = pd.Series(list(chain.from_iterable(toks_per_doc)))
            doc_row = np.repeat(np.arange(len(pdf)), lens)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos_in_doc = np.arange(total) - np.repeat(starts, lens)
            codes, uniq_terms = pd.factorize(all_toks, sort=False)
            doc_ids = pdf["doc_id"].to_numpy()[doc_row]
            shards = pdf["shard"].to_numpy().astype(np.int32)[doc_row]
            order = np.lexsort((pos_in_doc, doc_ids, shards, codes))
            codes, doc_ids, shards, pos_in_doc = (
                codes[order], doc_ids[order], shards[order], pos_in_doc[order]
            )
            g_change = np.empty(total, dtype=bool)
            g_change[0] = True
            g_change[1:] = (codes[1:] != codes[:-1]) | (shards[1:] != shards[:-1])
            d_change = g_change.copy()
            d_change[1:] |= doc_ids[1:] != doc_ids[:-1]
            gaps = pos_in_doc.copy()
            gaps[1:] = np.where(
                d_change[1:], pos_in_doc[1:], pos_in_doc[1:] - pos_in_doc[:-1]
            )
            g_starts = np.nonzero(g_change)[0]
            g_ends = np.append(g_starts[1:], total)
            d_idx = np.nonzero(d_change)[0]
            rows = []
            for s, e in zip(g_starts, g_ends):
                ds = d_idx[(d_idx >= s) & (d_idx < e)]
                ids = doc_ids[ds]
                tfs = np.diff(np.append(ds, e)).astype(np.int64)
                id_gaps = ids.astype(np.uint64).copy()
                id_gaps[1:] = (ids[1:] - ids[:-1]).astype(np.uint64)
                rows.append((
                    str(uniq_terms[codes[s]]), int(shards[s]), int(ids[0]),
                    int(len(ids)), varbyte_encode(id_gaps),
                    varbyte_encode(tfs.astype(np.uint64)),
                    varbyte_encode(gaps[s:e].astype(np.uint64)),
                ))
            yield pd.DataFrame(rows, columns=cols)

    batches = [
        pd.DataFrame({
            "doc_id": np.arange(400),
            "shard": (np.arange(400) // 100).astype(np.int32),
            "content": [_gen_row(i, 5000)[4] for i in range(400)],
        }),
        pd.DataFrame({"doc_id": [1], "shard": [0], "content": ["one doc"]}),
        pd.DataFrame({"doc_id": [1, 2], "shard": [0, 0],
                      "content": ["", "x y x"]}),
    ]
    for pdf in batches:
        want = list(reference(iter([pdf])))
        got = list(_positions_kernel(iter([pdf])))
        assert len(want) == len(got)
        for w, g in zip(want, got):
            w = w.reset_index(drop=True)
            g = g.reset_index(drop=True)
            assert list(w.columns) == list(g.columns)
            for c in w.columns:
                assert (w[c] == g[c]).all(), c
