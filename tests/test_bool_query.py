"""ES ``bool`` query analogue (BM25Query.topk_bool): must + should with
minimum_should_match + must_not, rank-identical to the pure-Python oracle
on both strategies, composing with delta segments/tombstones.

Reference contract: the reference's sink serves search through
Elasticsearch (README.md:13 "documents streamed in become searchable");
the bool query is core ES surface over the indexed stream. Conjunction
(bool.must alone) is already gated as topk_pruned(mode="all"); these
tests pin the general form.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.bm25 import bm25_bool_oracle
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index


@pytest.fixture(scope="module")
def bool_idx(spark, tmp_path_factory):
    """One 300-doc index + oracle token streams, shared by the module."""
    idx = str(tmp_path_factory.mktemp("boolidx") / "idx")
    corpus = synth_corpus(spark, 300)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    docs = spark.read.parquet(f"{idx}/docs").select("doc_id", "repo", "path").collect()
    src = {(r["repo"], r["path"]): r["content"] for r in corpus.collect()}
    toks = {r["doc_id"]: tokenize_py(src[(r["repo"], r["path"])]) for r in docs}
    return idx, toks


def _expected(toks, must, should, must_not, msm, k=10):
    return bm25_bool_oracle(
        toks, tokenize_py(must), tokenize_py(should), tokenize_py(must_not),
        msm, k,
    )


def _got(q, strategy, **kw):
    return [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in q.topk_bool(k=10, strategy=strategy, **kw).collect()
    ]


CASES = [
    # (must, should, must_not, msm) — each clause class exercised
    ("buffer value", "", "", 0),                      # == mode="all"
    ("get", "", "buffer", 0),                         # exclusion bites
    ("", "local var3 var7", "", 2),                   # msm over shoulds
    ("buffer", "var3 var11", "helper", 0),            # all three classes
    ("", "buffer qzxabsent", "", 1),                  # dead should clause
]


@pytest.mark.parametrize("must,should,must_not,msm", CASES)
def test_bool_rank_identity(spark, bool_idx, must, should, must_not, msm):
    """pruned == exact == pure-Python oracle (ids and 9-dp scores)."""
    idx, toks = bool_idx
    q = BM25Query(spark, idx)
    exp = [(d, round(s, 9)) for d, s in
           _expected(toks, must, should, must_not, msm)]
    for strategy in ("pruned", "exact"):
        got = _got(q, strategy, must=must, should=should, must_not=must_not,
                   minimum_should_match=msm)
        assert got == exp, (strategy, must, should, must_not, msm)


def test_bool_msm_defaults(spark, bool_idx):
    """ES defaults: should-only -> msm=1; must present -> msm=0 (shoulds
    become pure score boosters)."""
    idx, toks = bool_idx
    q = BM25Query(spark, idx)
    got = _got(q, "pruned", should="local var3")
    exp = [(d, round(s, 9)) for d, s in _expected(toks, "", "local var3", "", 1)]
    assert got == exp
    got = _got(q, "pruned", must="buffer", should="var3")
    exp = [(d, round(s, 9)) for d, s in _expected(toks, "buffer", "var3", "", 0)]
    assert got == exp


def test_bool_must_only_equals_mode_all(spark, bool_idx):
    """bool with only must clauses is exactly topk_pruned(mode='all')."""
    idx, _ = bool_idx
    q = BM25Query(spark, idx)
    a = _got(q, "pruned", must="buffer value")
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_pruned("buffer value", 10, mode="all").collect()]
    assert a == b


def test_bool_empty_results(spark, bool_idx):
    idx, _ = bool_idx
    q = BM25Query(spark, idx)
    # a must term absent from the whole corpus
    assert q.topk_bool(must="qzxabsent buffer").count() == 0
    # msm unsatisfiable: more matches required than should clauses
    assert q.topk_bool(should="buffer", minimum_should_match=3).count() == 0
    # msm counts only matchable clauses: both shoulds dead -> empty
    assert q.topk_bool(should="qzxabsent qzxother",
                       minimum_should_match=1).count() == 0


def test_bool_rejects_degenerate(spark, bool_idx):
    idx, _ = bool_idx
    q = BM25Query(spark, idx)
    with pytest.raises(ValueError, match="more than one clause class"):
        q.topk_bool(must="buffer", must_not="buffer")
    with pytest.raises(ValueError, match="more than one clause class"):
        q.topk_bool(must="buffer", should="buffer")
    with pytest.raises(ValueError, match="must, should, filter or range"):
        q.topk_bool(must_not="buffer")
    with pytest.raises(ValueError, match="unknown strategy"):
        q.topk_bool(must="buffer", strategy="zzz")
    with pytest.raises(ValueError, match="< 0"):
        q.topk_bool(should="buffer", minimum_should_match=-1)


def test_bool_with_pending_segments(spark, tmp_path):
    """bool composes with delta segments: pruned == exact through the
    tombstone-filtered candidate paths, a doc delta-updated to contain a
    must_not term disappears, and its replacement (without the term) is
    eligible."""
    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 200)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    victim = (
        spark.read.parquet(f"{idx}/docs").orderBy("doc_id").limit(1).collect()[0]
    )
    vkey = (victim["repo"], victim["path"])
    # the victim now contains the must_not marker; every other doc keeps
    # its content
    new_corpus = corpus.withColumn(
        "content",
        F.when(
            (F.col("repo") == vkey[0]) & (F.col("path") == vkey[1]),
            F.lit("zzforbidden buffer value zzmarker"),
        ).otherwise(F.col("content")),
    )
    changes = spark.createDataFrame(
        [(vkey[0], vkey[1], "index", 1)],
        "repo string, path string, action string, seq_no long",
    )
    apply_changes_to_index(spark, idx, new_corpus, changes, strategy="delta")
    q = BM25Query(spark, idx)
    # pruned == exact under pending segments (different candidate paths)
    for kw in (
        dict(must="buffer", must_not="zzforbidden"),
        dict(should="buffer zzforbidden", minimum_should_match=1),
    ):
        assert _got(q, "pruned", **kw) == _got(q, "exact", **kw), kw
    # the updated doc is excluded by must_not...
    hits = q.topk_bool(must="zzmarker", k=5)
    live = {
        (r["repo"], r["path"])
        for r in q.with_meta(hits).select("repo", "path").collect()
    }
    assert live == {vkey}  # sanity: the new version matches "marker"
    assert q.topk_bool(must="zzmarker", must_not="zzforbidden").count() == 0
    # ...and its TOMBSTONED old version never surfaces via its old terms
    old_hits = q.topk_bool(must="buffer", must_not="zzforbidden", k=200)
    old_ids = {int(r["doc_id"]) for r in old_hits.collect()}
    assert int(victim["doc_id"]) not in old_ids


FILTER_CASES = [
    # (must, should, must_not, filter, msm)
    ("buffer", "", "var7", "var3", 0),          # filter + exclusion
    ("", "var3 var11", "", "buffer", 0),        # shoulds boost over filter
    ("", "", "", "var3 buffer", 0),             # filter-only: score 0.0
    ("", "var3", "", "buffer", 0),              # msm defaults 0 w/ filter
]


@pytest.mark.parametrize("must,should,must_not,filt,msm", FILTER_CASES)
def test_bool_filter_rank_identity(spark, bool_idx, must, should, must_not,
                                   filt, msm):
    """filter clause (ES filter context): requires membership, never
    scores; filter-only hits carry score 0.0 ordered by doc_id."""
    idx, toks = bool_idx
    q = BM25Query(spark, idx)
    exp = [(d, round(s, 9)) for d, s in bm25_bool_oracle(
        toks, tokenize_py(must), tokenize_py(should), tokenize_py(must_not),
        msm, 10, filt=tokenize_py(filt),
    )]
    for strategy in ("pruned", "exact"):
        got = _got(q, strategy, must=must, should=should, must_not=must_not,
                   filter=filt, minimum_should_match=msm)
        assert got == exp, (strategy, must, should, must_not, filt)


def test_bool_filter_semantics(spark, bool_idx):
    idx, toks = bool_idx
    q = BM25Query(spark, idx)
    # filter-only: every hit scores exactly 0.0, ascending doc_id
    rows = q.topk_bool(filter="buffer", k=10).collect()
    assert rows and all(float(r["score"]) == 0.0 for r in rows)
    ids = [int(r["doc_id"]) for r in rows]
    assert ids == sorted(ids)
    # a filter term absent from the corpus empties the result
    assert q.topk_bool(filter="qzxabsent buffer").count() == 0
    # filter-context membership: a doc passing the filter but matching
    # no scoring term still qualifies (score 0) when msm permits
    n_filter_only = q.topk_bool(filter="buffer", k=10_000).count()
    n_with_should = q.topk_bool(should="var3", filter="buffer",
                                minimum_should_match=0, k=10_000).count()
    assert n_with_should == n_filter_only
    # clause overlap across filter and other classes rejected
    with pytest.raises(ValueError, match="more than one clause class"):
        q.topk_bool(must="buffer", filter="buffer")
    with pytest.raises(ValueError, match="more than one clause class"):
        q.topk_bool(filter="buffer", must_not="buffer")
