"""Index build: structure, invariants, determinism, LWW dedup semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus, with_duplicates
from go_dcp_elasticsearch_spark.functions.codec import varbyte_decode
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index.builder import (
    IndexBuilder,
    assign_doc_ids,
    dedup_last_write_wins,
)

N = 400


def _collect_tokens(corpus_rows):
    return {r["key"]: tokenize_py(r["content"]) for r in corpus_rows}


def test_dedup_last_write_wins(spark):
    corpus = with_duplicates(synth_corpus(spark, 100), every=10)
    deduped = dedup_last_write_wins(corpus)
    # keys with a duplicate must keep the newer (seq_no >= 1_000_000) version
    dup_keys = (
        corpus.groupBy("repo", "path").count().filter(F.col("count") > 1).collect()
    )
    assert len(dup_keys) > 0
    kept = {
        (r["repo"], r["path"]): r["seq_no"]
        for r in deduped.select("repo", "path", "seq_no").collect()
    }
    for r in dup_keys:
        assert kept[(r["repo"], r["path"])] >= 1_000_000
    assert deduped.groupBy("repo", "path").count().agg(F.max("count")).collect()[0][0] == 1


def test_doc_ids_dense_deterministic(spark):
    corpus = synth_corpus(spark, N)
    ids1 = assign_doc_ids(corpus, n_range_parts=8)
    rows = ids1.select("repo", "path", "doc_id").collect()
    n = len(rows)
    got = sorted((r["repo"], r["path"], r["doc_id"]) for r in rows)
    # dense 0..n-1, and ordered by (repo, path)
    assert sorted(r[2] for r in got) == list(range(n))
    assert [r[2] for r in got] == list(range(n))
    # deterministic across re-runs
    rows2 = assign_doc_ids(synth_corpus(spark, N), n_range_parts=8).collect()
    m2 = {(r["repo"], r["path"]): r["doc_id"] for r in rows2}
    for repo, path, did in got:
        assert m2[(repo, path)] == did


def test_build_structure_and_invariants(spark, tmp_index_dir):
    corpus = synth_corpus(spark, N)
    builder = IndexBuilder(spark, tmp_index_dir, n_shards=4, n_salts=4)
    summary = builder.build(corpus)
    assert summary["n_docs"] == N

    docs = spark.read.parquet(builder.paths.docs)
    assert docs.count() == N
    # per-row sha256 invariant vs source (input_hint)
    src = assign_doc_ids(dedup_last_write_wins(corpus))
    joined = docs.join(src.select("doc_id", "content"), "doc_id")
    bad = joined.filter(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
    assert bad == 0

    # dictionary df == number of docs containing term (spot-check via python)
    rows = src.select(
        F.concat_ws("/", "repo", "path").alias("key"), "content", "doc_id"
    ).collect()
    toks = {r["doc_id"]: tokenize_py(r["content"]) for r in rows}
    want_df = {}
    for _, ts in toks.items():
        for t in set(ts):
            want_df[t] = want_df.get(t, 0) + 1
    from go_dcp_elasticsearch_spark.index.builder import global_dictionary

    dic = {r["term"]: r["df"] for r in global_dictionary(spark, tmp_index_dir).collect()}
    assert dic == want_df

    # postings decode == python TF, per shard
    post = spark.read.parquet(builder.paths.postings).collect()
    got_tf: dict[tuple[str, int], int] = {}
    for r in post:
        ids = np.cumsum(varbyte_decode(bytes(r["ids_vb"])), dtype=np.uint64)
        tfs = varbyte_decode(bytes(r["tfs_vb"]))
        dls = varbyte_decode(bytes(r["dls_vb"]))
        assert len(ids) == len(tfs) == len(dls) == r["count"]
        from go_dcp_elasticsearch_spark.index.builder import shard_of

        assert all(shard_of(int(i), N, 4) == r["shard"] for i in ids)
        for i, tf, dl in zip(ids, tfs, dls):
            got_tf[(r["term"], int(i))] = int(tf)
            assert int(dl) == len(toks[int(i)])
    want_tf = {}
    for did, ts in toks.items():
        from collections import Counter

        for t, c in Counter(ts).items():
            want_tf[(t, did)] = c
    assert got_tf == want_tf

    # lineage rows committed for all stages
    stages = builder.lineage.completed_stages()
    assert {"stats", "docs", "postings", "dictionary"} <= stages


def test_build_resume_skips_done_stages(spark, tmp_index_dir):
    corpus = synth_corpus(spark, 120)
    b1 = IndexBuilder(spark, tmp_index_dir, n_shards=2)
    b1.build(corpus)
    before = spark.read.parquet(b1.paths.dictionary).collect()
    # resume: nothing re-runs, outputs byte-identical content
    b2 = IndexBuilder(spark, tmp_index_dir, n_shards=2)
    b2.build(corpus, resume=True)
    after = spark.read.parquet(b2.paths.dictionary).collect()
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_input_id_mode_rank_identical(spark, tmp_index_dir):
    """id_mode='input' (shuffle-free scale path): index is internally
    consistent and BM25 top-k matches the python oracle under ITS OWN
    doc-id mapping."""
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
    from go_dcp_elasticsearch_spark.index.query import BM25Query

    corpus = synth_corpus(spark, 300)
    b = IndexBuilder(spark, tmp_index_dir, n_shards=4, id_mode="input")
    summary = b.build(corpus)
    assert summary["n_docs"] == 300
    # reconstruct docs_tokens under the engine's id mapping via (repo,path)
    docs = spark.read.parquet(b.paths.docs).select("doc_id", "repo", "path")
    src = corpus.select("repo", "path", "content")
    joined = docs.join(src, ["repo", "path"]).collect()
    docs_tokens = {int(r["doc_id"]): tokenize_py(r["content"]) for r in joined}
    assert len(docs_tokens) == 300
    q = BM25Query(spark, tmp_index_dir)
    for qtext in ["getValue buffer", "quasarFlux", "helper_func_7 localVar11"]:
        want = bm25_oracle(docs_tokens, tokenize_py(qtext), 10)
        got = [(int(r["doc_id"]), float(r["score"])) for r in q.topk_pruned(qtext, 10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], qtext
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


def test_docs_meta_fusion_matches_source_metadata(spark, tmp_index_dir):
    """r7 docs-stage fusion: the docs table's metadata columns (repo,
    path, commit, lang, docvalues) come from the chunk kernel's sentinel
    rows now — assert they are exactly the LWW winner's values, with the
    docvalue column typed and non-perturbed, in the duplicate-heavy
    sorted mode with field + docvalue cols configured."""
    import hashlib

    corpus = with_duplicates(synth_corpus(spark, 150, n_partitions=4)).withColumn(
        "n_chars", F.length("content").cast("long")
    )
    IndexBuilder(
        spark, tmp_index_dir, n_shards=4,
        field_cols=["lang"], docvalue_cols=["n_chars"],
    ).build(corpus)

    docs = spark.read.parquet(f"{tmp_index_dir}/docs")
    assert docs.columns == [
        "doc_id", "repo", "path", "commit", "lang", "n_chars",
        "content_sha256", "doc_len", "shard",
    ]
    got = {
        (r["repo"], r["path"]): (
            r["commit"], r["lang"], int(r["n_chars"]), r["content_sha256"],
            int(r["doc_len"]),
        )
        for r in docs.collect()
    }
    src = corpus.collect()
    by_key: dict = {}
    for r in src:
        k = (r["repo"], r["path"])
        if k not in by_key or r["seq_no"] > by_key[k]["seq_no"]:
            by_key[k] = r
    assert len(got) == len(by_key)
    for k, r in by_key.items():
        assert got[k] == (
            r["commit"], r["lang"], int(r["n_chars"]),
            hashlib.sha256(r["content"].encode()).hexdigest(),
            len(tokenize_py(r["content"])),
        )
