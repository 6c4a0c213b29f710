"""Rank identity: Spark BM25 top-k (both physical strategies) must equal the
pure-Python oracle exactly — docIDs rank-identical, scores to 1e-9.

This is our analogue of the reference's exact golden assertion (the e2e test
polls until the ES doc count equals exactly 31,591,
test/integration/integration_test.go:68)."""

from __future__ import annotations

import pytest

from go_dcp_elasticsearch_spark.corpus import HOT_TERMS, RARE_TERMS, synth_corpus
from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index.builder import (
    IndexBuilder,
    assign_doc_ids,
    dedup_last_write_wins,
)
from go_dcp_elasticsearch_spark.index.query import BM25Query

N = 500

# reference query set (FIXTURES.md §3): hot terms, rare planted terms,
# absent terms, camelCase sub-token splits, mixed
QUERY_SET = [
    "getValue",
    "quasarFlux",
    "buffer index",
    "parseInput kraken_sentinel",
    "zephyrDelta obsidian_marker quasarFlux",
    "helper_func_7 localVar11",
    "completelyAbsentTermXyz",
    "getValue completelyAbsentTermXyz buffer",
    " ".join(HOT_TERMS),
    " ".join(RARE_TERMS),
]


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx"))
    corpus = synth_corpus(spark, N)
    IndexBuilder(spark, d, n_shards=4).build(corpus)
    rows = assign_doc_ids(dedup_last_write_wins(corpus)).select("doc_id", "content").collect()
    docs_tokens = {int(r["doc_id"]): tokenize_py(r["content"]) for r in rows}
    return d, docs_tokens


@pytest.mark.parametrize("k", [10, 3])
def test_rank_identity_both_strategies(spark, built, k):
    index_dir, docs_tokens = built
    q = BM25Query(spark, index_dir)
    for qtext in QUERY_SET:
        want = bm25_oracle(docs_tokens, tokenize_py(qtext), k)
        for strategy in ("topk_exact", "topk_pruned"):
            got = [
                (int(r["doc_id"]), float(r["score"]))
                for r in getattr(q, strategy)(qtext, k).collect()
            ]
            assert [g[0] for g in got] == [w[0] for w in want], (qtext, strategy)
            for (gd, gs), (wd, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-9, (qtext, strategy, gd)


@pytest.mark.parametrize("chunk_size", [64, 2])
def test_batch_retrieval_matches_single(spark, built, chunk_size):
    """Batch results must be chunking-invariant: chunk_size only bounds
    executor memory (decode caches cleared between chunks), never results."""
    index_dir, docs_tokens = built
    q = BM25Query(spark, index_dir)
    queries = list(enumerate(QUERY_SET[:5]))
    batch = q.topk_batch(queries, k=5, chunk_size=chunk_size).collect()
    by_qid: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], -r["score"], r["doc_id"])):
        by_qid.setdefault(int(r["query_id"]), []).append((int(r["doc_id"]), float(r["score"])))
    for qid, qtext in queries:
        want = bm25_oracle(docs_tokens, tokenize_py(qtext), 5)
        got = by_qid.get(qid, [])
        assert [g[0] for g in got] == [w[0] for w in want], qtext


def test_with_meta_roundtrip(spark, tmp_path):
    """Hits -> forward-store join returns the caller-facing identity
    (repo, path) for every hit, broadcast side = hits."""
    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder

    idx = str(tmp_path / "idx")
    IndexBuilder(spark, idx, n_shards=2).build(synth_corpus(spark, 120))
    q = BM25Query(spark, idx)
    hits = q.topk_pruned("getValue buffer", 5)
    out = q.with_meta(hits).collect()
    assert len(out) == 5
    assert all(r["repo"] and r["path"] and len(r["content_sha256"]) == 64 for r in out)
    assert {r["doc_id"] for r in out} == {r["doc_id"] for r in hits.collect()}


def test_epoch_check_ttl(spark, tmp_path):
    """epoch_check_interval_sec rate-limits the per-query staleness probe:
    within the window a mutation is NOT picked up (bounded staleness, the
    ES refresh_interval analogue); after the window expires — or via
    manual refresh() — the handle re-snapshots."""
    import time as _time

    from pyspark.sql import functions as F

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 60)
    IndexBuilder(spark, idx, n_shards=2).build(corpus)
    q = BM25Query(spark, idx, epoch_check_interval_sec=300.0)
    q.topk_pruned("getvalue", 3).collect()  # consume the first probe slot
    epoch0 = q._epoch

    victim = corpus.limit(1).collect()[0]
    new_corpus = corpus.withColumn(
        "content",
        F.when(
            (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"]),
            F.lit("zzttltoken fresh"),
        ).otherwise(F.col("content")),
    )
    changes = spark.createDataFrame(
        [(victim["repo"], victim["path"], "index", 99)],
        "repo string, path string, action string, seq_no long",
    )
    apply_changes_to_index(spark, idx, new_corpus, changes)

    # inside the TTL window: the handle must NOT refresh (epoch pinned)
    q.topk_pruned("zzttltoken", 3).collect()
    assert q._epoch == epoch0
    # expire the window: next query refreshes and sees the mutation
    q._last_epoch_check = _time.monotonic() - 301.0
    hits = q.topk_pruned("zzttltoken", 3).collect()
    assert q._epoch != epoch0
    assert len(hits) == 1


def test_conjunctive_mode(spark, tmp_path):
    """mode='all' (ES bool.must): every returned doc contains EVERY query
    term; scores use corpus-wide idf (identical to the matching 'any'
    docs' scores); pruned == exact == batch; unknown corpus-wide term
    empties the result; invalid mode raises."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder

    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 200)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    q = BM25Query(spark, idx)
    qtext = "var30 buffer parse"
    terms = q.analyze(qtext)

    a = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_pruned(qtext, 10, mode="all").collect()]
    b = [(int(r["doc_id"]), round(float(r["score"]), 9))
         for r in q.topk_exact(qtext, 10, mode="all").collect()]
    assert a == b and len(a) > 0
    batch = [(int(r["doc_id"]), round(float(r["score"]), 9))
             for r in q.topk_batch([(0, qtext)], 10, mode="all").collect()]
    assert batch == a

    # python oracle: corpus-wide-idf BM25, then keep only full matchers
    id_rows = (
        spark.read.parquet(f"{idx}/docs").select("doc_id", "repo", "path")
        .join(corpus.select("repo", "path", "content"), ["repo", "path"])
        .collect()
    )
    toks = {int(r["doc_id"]): tokenize_py(r["content"]) for r in id_rows}
    ranked = bm25_oracle(toks, terms, len(toks))
    want = [(d, round(s, 9)) for d, s in ranked
            if all(t in toks[d] for t in terms)][:10]
    assert [x[0] for x in a] == [x[0] for x in want]
    for (gd, gs), (wd, ws) in zip(a, want):
        assert abs(gs - ws) < 1e-9

    # full-match set sanity: every hit contains every term
    for d, _ in a:
        assert all(t in toks[d] for t in terms)
    # an impossible conjunction is empty; bad mode raises
    assert q.topk_pruned("var30 zzneverterm", 10, mode="all").count() == 0
    assert q.topk_exact("var30 zzneverterm", 10, mode="all").count() == 0
    with _pytest.raises(ValueError, match="mode"):
        q.topk_pruned(qtext, 10, mode="must")

    # conjunctive + delta segments: tombstoned docs never satisfy the
    # conjunction, delta-inserted full matchers do
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

    victim = id_rows[0]
    ins = spark.createDataFrame(
        [("orgC/conj", "c.py", "cc", "python",
          "var30 buffer parse zzconjfull", 5)],
        "repo string, path string, commit string, lang string, content string, seq_no int",
    )
    new_corpus = corpus.filter(
        ~((F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"]))
    ).unionByName(ins)
    changes = spark.createDataFrame(
        [(victim["repo"], victim["path"], "delete", 6),
         ("orgC/conj", "c.py", "index", 7)],
        "repo string, path string, action string, seq_no long",
    )
    apply_changes_to_index(spark, idx, new_corpus, changes, strategy="delta")
    hits = q.topk_pruned(qtext, 200, mode="all")
    got_ids = {int(r["doc_id"]) for r in hits.collect()}
    assert int(victim["doc_id"]) not in got_ids
    ins_id = int(
        q.with_meta(q.topk_pruned("zzconjfull", 1)).collect()[0]["doc_id"]
    )
    assert ins_id in got_ids
