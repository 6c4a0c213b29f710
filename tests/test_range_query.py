"""ES ``range`` query analogue: numeric doc-values (IndexBuilder
docvalue_cols) + BM25Query.topk_bool(range=...), rank-identical to the
pure-Python oracle, composing with every other bool clause and with both
incremental apply paths.

Reference contract: the reference's sink serves search through
Elasticsearch (README.md:13 "documents streamed in become searchable");
range queries over numeric metadata are core ES surface (BKD-tree /
doc_values). Our analogue stores the numeric columns in the columnar
docs table and pushes the bounds into the parquet scan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.bm25 import bm25_bool_oracle
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index


def _with_nc(corpus):
    return corpus.withColumn("nc", F.length("content").cast("long"))


@pytest.fixture(scope="module")
def range_idx(spark, tmp_path_factory):
    """300-doc index with a numeric doc-value column nc = len(content);
    returns (idx_dir, doc_id -> tokens, doc_id -> nc)."""
    idx = str(tmp_path_factory.mktemp("rangeidx") / "idx")
    corpus = _with_nc(synth_corpus(spark, 300))
    IndexBuilder(spark, idx, n_shards=4, docvalue_cols=["nc"]).build(corpus)
    docs = spark.read.parquet(f"{idx}/docs").select(
        "doc_id", "repo", "path", "nc"
    ).collect()
    src = {(r["repo"], r["path"]): r["content"] for r in corpus.collect()}
    toks = {r["doc_id"]: tokenize_py(src[(r["repo"], r["path"])]) for r in docs}
    ncs = {r["doc_id"]: int(r["nc"]) for r in docs}
    return idx, toks, ncs


def _allowed(ncs, lo=None, hi=None, lo_strict=False, hi_strict=False):
    out = set()
    for d, v in ncs.items():
        if lo is not None and (v <= lo if lo_strict else v < lo):
            continue
        if hi is not None and (v >= hi if hi_strict else v > hi):
            continue
        out.add(d)
    return out


def _got(q, **kw):
    return [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in q.topk_bool(k=10, **kw).collect()
    ]


def _exp(toks, must="", should="", must_not="", msm=0, allowed=None):
    return [
        (d, round(s, 9))
        for d, s in bm25_bool_oracle(
            toks, tokenize_py(must), tokenize_py(should),
            tokenize_py(must_not), msm, 10, allowed=allowed,
        )
    ]


def test_docvalue_cols_in_docs_table(spark, range_idx):
    idx, _, ncs = range_idx
    from go_dcp_elasticsearch_spark.index.builder import read_index_meta

    assert read_index_meta(spark, idx)["docvalue_cols"] == ["nc"]
    fields = {f.name for f in spark.read.parquet(f"{idx}/docs").schema.fields}
    assert "nc" in fields
    assert len(ncs) == 300


def test_range_plus_must_rank_identity(spark, range_idx):
    """must + range == oracle restricted to the allowed id set; the
    strategy knob is irrelevant under a range clause (documented)."""
    idx, toks, ncs = range_idx
    q = BM25Query(spark, idx)
    med = sorted(ncs.values())[150]
    exp = _exp(toks, must="buffer", allowed=_allowed(ncs, hi=med, hi_strict=True))
    for strategy in ("pruned", "exact"):
        got = _got(q, must="buffer", range={"nc": {"lt": med}},
                   strategy=strategy)
        assert got == exp, strategy
    assert exp, "case must be non-trivial"


def test_range_both_bounds_and_gt_lte(spark, range_idx):
    idx, toks, ncs = range_idx
    q = BM25Query(spark, idx)
    vals = sorted(ncs.values())
    lo, hi = vals[60], vals[240]
    got = _got(q, must="get", range={"nc": {"gt": lo, "lte": hi}})
    exp = _exp(toks, must="get",
               allowed=_allowed(ncs, lo=lo, lo_strict=True, hi=hi))
    assert got == exp and exp


def test_range_only_score_zero_docid_order(spark, range_idx):
    """Range-only query: ES filter context — score 0.0, doc_id asc."""
    idx, _, ncs = range_idx
    q = BM25Query(spark, idx)
    med = sorted(ncs.values())[150]
    got = _got(q, range={"nc": {"gte": med}})
    allowed = sorted(_allowed(ncs, lo=med))
    assert got == [(d, 0.0) for d in allowed[:10]]


def test_range_only_with_must_not(spark, range_idx):
    idx, toks, ncs = range_idx
    q = BM25Query(spark, idx)
    med = sorted(ncs.values())[150]
    got = _got(q, must_not="buffer", range={"nc": {"gte": med}})
    allowed = _allowed(ncs, lo=med)
    keep = sorted(d for d in allowed if "buffer" not in set(toks[d]))
    assert got == [(d, 0.0) for d in keep[:10]]
    assert len(keep) < len(allowed), "must_not must bite"


def test_range_should_boost_keeps_score_zero_docs(spark, range_idx):
    """range + should with the ES default msm=0 (range is filter
    context): every range doc qualifies, should only boosts — score-0
    docs appear after the boosted ones."""
    idx, toks, ncs = range_idx
    q = BM25Query(spark, idx)
    # pick a slice with MORE range docs than boosted docs so score-0
    # hits must appear inside the top-10
    vals = sorted(set(ncs.values()))
    lo = None
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            a = _allowed(ncs, lo=vals[i], hi=vals[j], hi_strict=True)
            boosted = {
                d for d in a if {"var3", "var7"} & set(toks[d])
            }
            if len(a) >= 10 and 0 < len(boosted) <= 5:
                lo, hi = vals[i], vals[j]
                allowed = a
                break
        if lo is not None:
            break
    assert lo is not None, "fixture must admit a mixed slice"
    got = _got(q, should="var3 var7", range={"nc": {"gte": lo, "lt": hi}})
    exp = _exp(toks, should="var3 var7", msm=0, allowed=allowed)
    assert got == exp
    assert any(s == 0.0 for _, s in got), "score-0 range docs must surface"
    assert any(s > 0.0 for _, s in got), "boosted docs must surface"


def test_range_with_explicit_msm_semi_join_path(spark, range_idx):
    """range + should + msm>=1: qualifying docs must match shoulds, so
    the scored semi-join path serves it."""
    idx, toks, ncs = range_idx
    q = BM25Query(spark, idx)
    med = sorted(ncs.values())[150]
    allowed = _allowed(ncs, hi=med, hi_strict=True)
    got = _got(q, should="var3 var7", minimum_should_match=1,
               range={"nc": {"lt": med}})
    exp = _exp(toks, should="var3 var7", msm=1, allowed=allowed)
    assert got == exp and exp


def test_range_matching_all_docs_equals_rangeless(spark, range_idx):
    idx, _, _ = range_idx
    q = BM25Query(spark, idx)
    a = _got(q, must="buffer", should="var3", range={"nc": {"gte": 0}})
    b = _got(q, must="buffer", should="var3")
    assert a == b


def test_range_on_doc_len_always_available(spark, range_idx):
    """doc_len is a built-in numeric doc-value on every index."""
    idx, toks, _ = range_idx
    q = BM25Query(spark, idx)
    dls = {d: len(t) for d, t in toks.items()}
    med = sorted(dls.values())[150]
    got = _got(q, must="get", range={"doc_len": {"gte": med}})
    exp = _exp(toks, must="get",
               allowed={d for d, v in dls.items() if v >= med})
    assert got == exp and exp


def test_range_validation_errors(spark, range_idx):
    idx, _, _ = range_idx
    q = BM25Query(spark, idx)
    with pytest.raises(ValueError, match="not in the docs table"):
        q.topk_bool(must="get", range={"missing": {"gte": 1}})
    with pytest.raises(ValueError, match="must be numeric|numeric doc-value"):
        q.topk_bool(must="get", range={"lang": {"gte": 1}})
    with pytest.raises(ValueError, match="unknown bound"):
        q.topk_bool(must="get", range={"nc": {"between": 1}})
    with pytest.raises(ValueError, match="must be a number"):
        q.topk_bool(must="get", range={"nc": {"gte": "x"}})
    with pytest.raises(ValueError, match="non-empty"):
        q.topk_bool(must="get", range={})
    with pytest.raises(ValueError, match="non-empty"):
        q.topk_bool(must="get", range={"nc": {}})
    with pytest.raises(ValueError, match="internal engine column"):
        q.topk_bool(must="get", range={"doc_id": {"gte": 1}})
    # a malformed spec raises even when the must term is dead
    with pytest.raises(ValueError, match="not in the docs table"):
        q.topk_bool(must="qzxabsent", range={"missing": {"gte": 1}})


def test_builder_docvalue_validation(spark, tmp_path):
    corpus = synth_corpus(spark, 20)
    with pytest.raises(ValueError, match="reserved|lowercase"):
        IndexBuilder(spark, str(tmp_path / "i1"), docvalue_cols=["doc_len"])
    b = IndexBuilder(spark, str(tmp_path / "i2"), docvalue_cols=["nc"])
    with pytest.raises(ValueError, match="missing from the corpus"):
        b.build(corpus)  # corpus lacks nc
    b2 = IndexBuilder(spark, str(tmp_path / "i3"), docvalue_cols=["lang2"])
    with pytest.raises(ValueError, match="must be numeric"):
        b2.build(corpus.withColumn("lang2", F.col("lang")))


def test_range_after_delta_apply(spark, tmp_path):
    """A delta-segment apply updates content (nc changes): the range view
    serves the NEW values immediately (base ∪ alive-delta, tombstones
    dropped), and a rebuild-strategy apply preserves doc-values too."""
    idx = str(tmp_path / "idx")
    corpus = _with_nc(synth_corpus(spark, 120))
    IndexBuilder(spark, idx, n_shards=3, docvalue_cols=["nc"]).build(corpus)

    # grow 5 docs' content far past any existing nc
    pad = " zzrangetoken" * 400
    changed = corpus.filter(F.col("seq_no") % 24 == 1)
    n_changed = changed.count()
    new_rows = changed.withColumn(
        "content", F.concat(F.col("content"), F.lit(pad))
    ).withColumn("seq_no", F.col("seq_no") + F.lit(1_000_000))
    new_corpus = _with_nc(
        corpus.drop("nc")
        .join(new_rows.select("repo", "path"), ["repo", "path"], "left_anti")
        .unionByName(new_rows.drop("nc"))
    )
    changes = new_rows.select(
        "repo", "path", F.lit("upsert").alias("action"), "seq_no"
    )
    out = apply_changes_to_index(
        spark, idx, new_corpus, changes, strategy="delta"
    )
    assert out["strategy"] == "delta" and out["segment"] is not None

    big = int(
        corpus.agg(F.max(F.length("content"))).collect()[0][0]
    )  # old max nc: every updated doc now exceeds it
    q = BM25Query(spark, idx)
    got = _got(q, range={"nc": {"gt": big}})
    assert len(got) == min(n_changed, 10) and all(s == 0.0 for _, s in got)
    # the updated docs carry NEW doc_ids (Lucene update model) and all
    # contain the pad token
    hit_ids = {d for d, _ in got}
    meta = q.with_meta(q.topk_bool(range={"nc": {"gt": big}}, k=10))
    assert {int(r["doc_id"]) for r in meta.collect()} == hit_ids

    # rebuild-strategy apply preserves the doc-values as well
    out2 = apply_changes_to_index(
        spark, idx, new_corpus, changes, strategy="rebuild"
    )
    assert out2.get("segment") is None
    q.refresh()
    got2 = _got(q, range={"nc": {"gt": big}})
    assert len(got2) == min(n_changed, 10)


def test_delta_apply_missing_docvalue_column_fails_fast(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _with_nc(synth_corpus(spark, 40))
    IndexBuilder(spark, idx, n_shards=2, docvalue_cols=["nc"]).build(corpus)
    changed = corpus.limit(2).withColumn(
        "seq_no", F.col("seq_no") + F.lit(1_000_000)
    )
    changes = changed.select(
        "repo", "path", F.lit("upsert").alias("action"), "seq_no"
    )
    bare = corpus.drop("nc")  # post-change corpus WITHOUT the doc-value
    with pytest.raises(ValueError, match="docvalue column 'nc' missing"):
        apply_changes_to_index(spark, idx, bare, changes, strategy="delta")
    with pytest.raises(ValueError, match="docvalue column 'nc' missing"):
        apply_changes_to_index(spark, idx, bare, changes, strategy="rebuild")
