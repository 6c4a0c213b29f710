"""Keyword-field indexing (IndexBuilder field_cols): metadata columns as
``col:value`` postings — the ES keyword-field mapping the reference's
sink gets from Elasticsearch index mappings (its docs pass mappings
verbatim to ES index creation; our engine owns them natively).

Invariants pinned here:
- field postings NEVER perturb BM25: n_docs/avgdl/dl and every text
  score are bit-identical with and without field_cols;
- filter="col:value" partitions exactly like the source column predicate;
- delta applies propagate field-value CHANGES (new value matches, old
  value stops matching, the tombstoned old doc never surfaces);
- term expansions (prefix/fuzzy/wildcard) never leak the field namespace;
- field terms are rejected in scoring clauses (they would silently
  analyze into garbage tokens otherwise).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index


@pytest.fixture(scope="module")
def field_idx(spark, tmp_path_factory):
    """One corpus, built twice: plain and with field_cols=["lang"]."""
    root = tmp_path_factory.mktemp("fieldidx")
    corpus = synth_corpus(spark, 300)
    plain = str(root / "plain")
    fielded = str(root / "f")
    s_plain = IndexBuilder(spark, plain, n_shards=4).build(corpus)
    s_field = IndexBuilder(
        spark, fielded, n_shards=4, field_cols=["lang"]
    ).build(corpus)
    return plain, fielded, corpus, s_plain, s_field


def test_field_postings_do_not_perturb_bm25(spark, field_idx):
    plain, fielded, corpus, s_plain, s_field = field_idx
    assert s_plain["n_docs"] == s_field["n_docs"]
    assert abs(s_plain["avgdl"] - s_field["avgdl"]) < 1e-12
    qp = BM25Query(spark, plain)
    qf = BM25Query(spark, fielded)
    for query in ("buffer value", "get", "local var3"):
        a = [(int(r["doc_id"]), round(float(r["score"]), 12))
             for r in qp.topk_pruned(query, 10).collect()]
        b = [(int(r["doc_id"]), round(float(r["score"]), 12))
             for r in qf.topk_pruned(query, 10).collect()]
        assert a == b, query


def test_field_filter_partitions_like_column_predicate(spark, field_idx):
    _, fielded, corpus, *_ = field_idx
    q = BM25Query(spark, fielded)
    langs = sorted(
        r["lang"] for r in corpus.select("lang").distinct().collect()
    )
    total = corpus.count()
    seen = 0
    for lv in langs:
        n_col = corpus.filter(F.col("lang") == lv).count()
        n_idx = q.topk_bool(filter=f"lang:{lv}", k=1_000_000).count()
        assert n_idx == n_col, lv
        seen += n_idx
    assert seen == total  # the field values partition the corpus
    # must + field filter + field must_not partition identity
    tot = q.topk_bool(must="buffer", k=1_000_000).count()
    inc = q.topk_bool(must="buffer", filter=f"lang:{langs[0]}",
                      k=1_000_000).count()
    exc = q.topk_bool(must="buffer", must_not=f"lang:{langs[0]}",
                      k=1_000_000).count()
    assert tot == inc + exc
    # pruned == exact through the field-filtered kernel
    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_bool(must="buffer", filter=f"lang:{langs[0]}",
                              k=10).collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_bool(must="buffer", filter=f"lang:{langs[0]}",
                              k=10, strategy="exact").collect()]
    assert a == b


def test_field_namespace_isolated(spark, field_idx):
    _, fielded, *_ = field_idx
    q = BM25Query(spark, fielded)
    # expansions never leak col:value terms
    assert q.expand_prefix("lang", 50) == []
    assert q.expand_wildcard("lang*", 50) == []
    assert all(":" not in t
               for t in q.expand_fuzzy("lang", max_edits=2, max_expansions=50))
    # field terms in scoring clauses are rejected loudly
    with pytest.raises(ValueError, match="never score"):
        q.topk_bool(must="lang:en")
    with pytest.raises(ValueError, match="never score"):
        q.topk_bool(should="buffer lang:en")
    # unknown field value: empty result, not an error
    assert q.topk_bool(filter="lang:nosuch").count() == 0


def test_field_cols_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="lowercase identifiers"):
        IndexBuilder(spark, str(tmp_path / "x"), field_cols=["Lang"])
    with pytest.raises(ValueError, match="lowercase identifiers"):
        IndexBuilder(spark, str(tmp_path / "x"), field_cols=["content"])


def test_delta_apply_propagates_field_change(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 200)
    IndexBuilder(spark, idx, n_shards=4, field_cols=["lang"]).build(corpus)
    vk = corpus.orderBy("repo", "path").limit(1).collect()[0]
    new_corpus = corpus.withColumn(
        "lang",
        F.when(
            (F.col("repo") == vk["repo"]) & (F.col("path") == vk["path"]),
            F.lit("zzlang"),
        ).otherwise(F.col("lang")),
    )
    changes = spark.createDataFrame(
        [(vk["repo"], vk["path"], "index", 1)],
        "repo string, path string, action string, seq_no long",
    )
    out = apply_changes_to_index(spark, idx, new_corpus, changes,
                                 strategy="delta")
    assert out["strategy"] == "delta"
    q = BM25Query(spark, idx)
    # the new field value matches exactly the changed doc
    hits = q.topk_bool(filter="lang:zzlang", k=10)
    keys = {(r["repo"], r["path"])
            for r in q.with_meta(hits).select("repo", "path").collect()}
    assert keys == {(vk["repo"], vk["path"])}
    # the old value no longer matches it (tombstoned old posting)
    old = q.topk_bool(filter=f"lang:{vk['lang']}", k=1_000_000)
    old_keys = {(r["repo"], r["path"])
                for r in q.with_meta(old).select("repo", "path").collect()}
    assert (vk["repo"], vk["path"]) not in old_keys
    # rebuild-strategy apply maintains field postings too: change a
    # SECOND doc's lang with a fresh seq_no through the rebuild path
    vk2 = corpus.orderBy("repo", "path").limit(2).collect()[1]
    new_corpus2 = new_corpus.withColumn(
        "lang",
        F.when(
            (F.col("repo") == vk2["repo"]) & (F.col("path") == vk2["path"]),
            F.lit("zzlang2"),
        ).otherwise(F.col("lang")),
    )
    changes2 = spark.createDataFrame(
        [(vk2["repo"], vk2["path"], "index", 2)],
        "repo string, path string, action string, seq_no long",
    )
    out2 = apply_changes_to_index(spark, idx, new_corpus2, changes2,
                                  strategy="rebuild")
    assert out2["n_changed"] == 1 and out2.get("segment") is None
    q = q.refresh()
    hits2 = q.topk_bool(filter="lang:zzlang2", k=10)
    keys2 = {(r["repo"], r["path"])
             for r in q.with_meta(hits2).select("repo", "path").collect()}
    assert keys2 == {(vk2["repo"], vk2["path"])}
    # and the first (delta-segment) change still serves
    assert q.topk_bool(filter="lang:zzlang", k=10).count() == 1
