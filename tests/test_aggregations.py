"""ES search-aggregation analogues (BM25Query.agg_terms / agg_stats /
agg_histogram) over the full bool-query match set, plus match_frame (the
all-matches scoring frame they reduce).

Reference contract: the reference's sink serves search through
Elasticsearch (README.md:13); aggregations are the other half of the ES
_search API (query + aggs in one request). ES runs aggs over EVERY
matching doc, not the top-k page — match_frame provides exactly that
set, and the agg methods reduce it declaratively (partial aggregation,
no collect)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.bm25 import bm25_bool_oracle
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder


@pytest.fixture(scope="module")
def agg_idx(spark, tmp_path_factory):
    """250-doc index with lang keyword metadata and an nc doc-value;
    returns (idx_dir, doc_id -> tokens, doc_id -> (lang, nc))."""
    idx = str(tmp_path_factory.mktemp("aggidx") / "idx")
    corpus = synth_corpus(spark, 250).withColumn(
        "nc", F.length("content").cast("long")
    )
    IndexBuilder(spark, idx, n_shards=4, docvalue_cols=["nc"]).build(corpus)
    rows = spark.read.parquet(f"{idx}/docs").select(
        "doc_id", "repo", "path", "lang", "nc"
    ).collect()
    src = {(r["repo"], r["path"]): r["content"] for r in corpus.collect()}
    toks = {r["doc_id"]: tokenize_py(src[(r["repo"], r["path"])]) for r in rows}
    meta = {r["doc_id"]: (r["lang"], int(r["nc"])) for r in rows}
    return idx, toks, meta


def _match_ids(toks, must="", must_not="", msm=0, should="", filt=""):
    """All matching doc ids via the pure-Python bool oracle (k=corpus)."""
    return {
        d for d, _ in bm25_bool_oracle(
            toks, tokenize_py(must), tokenize_py(should),
            tokenize_py(must_not), msm, len(toks),
            filt=tokenize_py(filt) or None,
        )
    }


# ---------------------------------------------------------------- match_frame


def test_match_frame_is_all_matches_with_topk_scores(spark, agg_idx):
    """match_frame == the unlimited exact bool frame: same ids as the
    oracle, and its top-10 slice equals topk_bool."""
    idx, toks, _ = agg_idx
    q = BM25Query(spark, idx)
    got = {int(r["doc_id"]): round(float(r["score"]), 9)
           for r in q.match_frame(must="buffer", should="var3").collect()}
    exp_ids = _match_ids(toks, must="buffer")
    assert set(got) == exp_ids and len(exp_ids) > 10
    top = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    topk = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in q.topk_bool(must="buffer", should="var3", k=10).collect()]
    assert top == topk


def test_match_frame_match_all(spark, agg_idx):
    idx, toks, _ = agg_idx
    q = BM25Query(spark, idx)
    rows = q.match_frame(match_all=True).collect()
    assert {int(r["doc_id"]) for r in rows} == set(toks)
    assert all(float(r["score"]) == 0.0 for r in rows)
    with pytest.raises(ValueError, match="match_all"):
        q.match_frame()


def test_match_frame_range(spark, agg_idx):
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    med = sorted(v for _, v in meta.values())[125]
    got = {int(r["doc_id"])
           for r in q.match_frame(must="get",
                                  range={"nc": {"lt": med}}).collect()}
    exp = {d for d in _match_ids(toks, must="get") if meta[d][1] < med}
    assert got == exp and exp


# ---------------------------------------------------------------- agg_terms


def test_agg_terms_matches_counter(spark, agg_idx):
    """terms agg over a must query == Counter of the oracle match set,
    ordered (count desc, value asc), capped at size."""
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    ids = _match_ids(toks, must="buffer")
    cnt = Counter(meta[d][0] for d in ids)
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [(r["value"], int(r["doc_count"]))
           for r in q.agg_terms("lang", size=3, must="buffer").collect()]
    assert got == exp and exp


def test_agg_terms_match_all_and_range(spark, agg_idx):
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    # match_all: buckets over every live doc
    cnt = Counter(lang for lang, _ in meta.values())
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["value"], int(r["doc_count"]))
           for r in q.agg_terms("lang", size=100).collect()]
    assert got == exp
    # range-only: the pushed-predicate docs scan path
    med = sorted(v for _, v in meta.values())[125]
    cnt = Counter(lang for lang, v in meta.values() if v >= med)
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = [(r["value"], int(r["doc_count"]))
           for r in q.agg_terms("lang", size=100,
                                range={"nc": {"gte": med}}).collect()]
    assert got == exp


def test_agg_terms_validation(spark, agg_idx):
    idx, _, _ = agg_idx
    q = BM25Query(spark, idx)
    with pytest.raises(ValueError, match="not in the docs table"):
        q.agg_terms("missing", must="get")
    with pytest.raises(ValueError, match="internal engine column"):
        q.agg_terms("shard", must="get")
    with pytest.raises(ValueError, match="size must be > 0"):
        q.agg_terms("lang", size=0, must="get")


# ---------------------------------------------------------------- agg_stats


def test_agg_stats_matches_python(spark, agg_idx):
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    ids = _match_ids(toks, must="get", must_not="buffer")
    vals = [meta[d][1] for d in ids]
    assert vals, "fixture must leave a non-empty match set"
    row = q.agg_stats("nc", must="get", must_not="buffer").collect()[0]
    assert int(row["count"]) == len(vals)
    assert float(row["min"]) == min(vals)
    assert float(row["max"]) == max(vals)
    assert math.isclose(float(row["avg"]), sum(vals) / len(vals))
    assert float(row["sum"]) == float(sum(vals))


def test_agg_stats_needs_numeric(spark, agg_idx):
    idx, _, _ = agg_idx
    q = BM25Query(spark, idx)
    with pytest.raises(ValueError, match="numeric doc-value"):
        q.agg_stats("lang", must="get")


# ------------------------------------------------------------ agg_histogram


def test_agg_histogram_matches_python(spark, agg_idx):
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    ids = _match_ids(toks, must="get")
    interval = 25.0
    cnt = Counter(math.floor(meta[d][1] / interval) * interval for d in ids)
    exp = sorted(cnt.items())
    got = [(float(r["bucket"]), int(r["doc_count"]))
           for r in q.agg_histogram("nc", interval, must="get").collect()]
    assert got == exp and len(exp) > 1


def test_agg_histogram_validation(spark, agg_idx):
    idx, _, _ = agg_idx
    q = BM25Query(spark, idx)
    with pytest.raises(ValueError, match="interval must be > 0"):
        q.agg_histogram("nc", 0.0, must="get")
    with pytest.raises(ValueError, match="numeric doc-value"):
        q.agg_histogram("lang", 10.0, must="get")


def test_agg_composes_with_delta_segments(spark, tmp_path):
    """Aggregations run over the LIVE view: a delta apply's updates are
    counted once (new version), tombstoned old versions never."""
    from go_dcp_elasticsearch_spark.sources.changes import (
        apply_changes_to_index,
    )

    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 100).withColumn(
        "nc", F.length("content").cast("long")
    )
    IndexBuilder(spark, idx, n_shards=2, docvalue_cols=["nc"]).build(corpus)
    q = BM25Query(spark, idx)
    before = int(q.agg_stats("nc").collect()[0]["count"])
    assert before == 100

    changed = corpus.filter(F.col("seq_no") % 20 == 1)
    new_rows = changed.withColumn(
        "content", F.concat(F.col("content"), F.lit(" zzaggtoken" * 50))
    ).withColumn("nc", F.length("content").cast("long")).withColumn(
        "seq_no", F.col("seq_no") + F.lit(1_000_000)
    )
    new_corpus = corpus.join(
        new_rows.select("repo", "path"), ["repo", "path"], "left_anti"
    ).unionByName(new_rows)
    changes = new_rows.select(
        "repo", "path", F.lit("upsert").alias("action"), "seq_no"
    )
    out = apply_changes_to_index(
        spark, idx, new_corpus, changes, strategy="delta"
    )
    assert out["strategy"] == "delta"
    q.refresh()
    row = q.agg_stats("nc").collect()[0]
    assert int(row["count"]) == 100  # updates replace, never double-count
    n_changed = changed.count()
    grown = int(
        q.agg_stats("nc", must="zzaggtoken").collect()[0]["count"]
    )
    assert grown == n_changed


def test_agg_cardinality_exact_and_approx(spark, agg_idx):
    idx, toks, meta = agg_idx
    q = BM25Query(spark, idx)
    ids = _match_ids(toks, must="buffer")
    exp = len({meta[d][0] for d in ids})
    exact = int(q.agg_cardinality("lang", exact=True,
                                  must="buffer").collect()[0]["value"])
    assert exact == exp
    # HLL++ estimate: within the rsd band for a tiny cardinality it is
    # exact in practice; allow generous slack to stay non-flaky
    approx = int(q.agg_cardinality("lang", rsd=0.01,
                                   must="buffer").collect()[0]["value"])
    assert abs(approx - exp) <= max(1, exp // 5)
    with pytest.raises(ValueError, match="not in the docs table"):
        q.agg_cardinality("missing", must="buffer")
