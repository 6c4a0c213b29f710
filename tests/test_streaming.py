"""Structured Streaming ingest: AvailableNow drain, checkpointed resume
(only new files processed on restart), per-batch LWW dedup."""

from __future__ import annotations

import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from go_dcp_elasticsearch_spark.streaming.pipeline import stream_changes

SCHEMA = StructType(
    [
        StructField("key", StringType(), True),
        StructField("action", StringType(), True),
        StructField("content", StringType(), True),
        StructField("seq_no", LongType(), True),
    ]
)


def _write_batch(spark, src, rows, name):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{name}")


def test_stream_drain_and_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_batch(spark, src, [("a", "index", "v1", 1), ("a", "index", "v2", 2),
                              ("b", "index", "w1", 1)], "f1")
    q = stream_changes(spark, f"{src}/*", SCHEMA, sink, ckpt, ["key"], "seq_no")
    q.awaitTermination(60)

    out = spark.read.parquet(sink)
    rows = {(r["key"], r["seq_no"]) for r in out.collect()}
    # LWW within the micro-batch: only seq 2 for key a survives
    assert rows == {("a", 2), ("b", 1)}

    # new file arrives; restart from checkpoint -> ONLY the new file lands
    _write_batch(spark, src, [("c", "index", "x1", 5)], "f2")
    q2 = stream_changes(spark, f"{src}/*", SCHEMA, sink, ckpt, ["key"], "seq_no")
    q2.awaitTermination(60)
    rows2 = {(r["key"], r["seq_no"]) for r in spark.read.parquet(sink).collect()}
    assert rows2 == {("a", 2), ("b", 1), ("c", 5)}


def test_stream_changes_to_index_end_to_end(spark, tmp_path):
    """A1/A18/B1-B2 full loop: build index + corpus mirror, stream two
    change files (update + delete + insert), AvailableNow drain; the
    QUERYABLE index reflects the stream and ranks match a full rebuild."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType, StringType, StructField, StructType,
    )

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.streaming.pipeline import (
        stream_changes_to_index,
        write_corpus_mirror,
    )

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "changes_src")
    ckpt = str(tmp_path / "ckpt")
    corpus = synth_corpus(spark, 150)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    write_corpus_mirror(spark, idx, corpus, n_buckets=8)

    docs0 = spark.read.parquet(f"{idx}/docs")
    victims = docs0.orderBy("doc_id").limit(2).collect()
    upd_key = (victims[0]["repo"], victims[0]["path"])
    del_key = (victims[1]["repo"], victims[1]["path"])

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("action", StringType()), StructField("commit", StringType()),
        StructField("lang", StringType()), StructField("content", StringType()),
        StructField("seq_no", IntegerType()),
    ])
    new_content = "streamedRewrite nebularPulse nebularPulse buffer"
    batch1 = [(upd_key[0], upd_key[1], "index", "c1", "python", new_content, 1001),
              (del_key[0], del_key[1], "delete", None, None, None, 1002)]
    batch2 = [("orgS/streamrepo", "src/s.py", "index", "c2", "go",
               "streamInserted vortex_beacon parser", 1003)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    q = stream_changes_to_index(spark, src, schema, idx, ckpt, available_now=True)
    q.awaitTermination(120)
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_changes_to_index(spark, src, schema, idx, ckpt, available_now=True)
    q2.awaitTermination(120)

    docs1 = spark.read.parquet(f"{idx}/docs")
    assert docs1.filter(
        (F.col("repo") == del_key[0]) & (F.col("path") == del_key[1])
    ).count() == 0
    assert docs1.filter(F.col("repo") == "orgS/streamrepo").count() == 1
    assert docs1.count() == 150  # -1 delete +1 insert

    # rank identity over the post-stream state
    mirror = spark.read.parquet(f"{idx}/_corpus")
    id_rows = docs1.select("doc_id", "repo", "path").join(
        mirror.select("repo", "path", "content"), ["repo", "path"]
    ).collect()
    assert len(id_rows) == 150  # mirror consistent with docs
    toks = {int(r["doc_id"]): tokenize_py(r["content"]) for r in id_rows}
    bq = BM25Query(spark, idx)
    for qtext in ["nebularPulse buffer", "vortex_beacon", "getValue index"]:
        want = bm25_oracle(toks, tokenize_py(qtext), 10)
        got = [(int(r["doc_id"]), float(r["score"]))
               for r in bq.topk_pruned(qtext, 10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], qtext
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


def test_stream_changes_to_index_delta_strategy(spark, tmp_path):
    """Round 5: the streaming loop with apply_strategy='delta' — each
    micro-batch lands as a delta segment (no base shard rewritten), the
    live view reflects the stream, and auto_fold keeps the delta area
    bounded. Final check folds and asserts full rank identity."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.index.builder import IndexPaths
    from go_dcp_elasticsearch_spark.index.segments import (
        fold_segments,
        has_segments,
        read_docs,
    )
    from go_dcp_elasticsearch_spark.streaming.pipeline import (
        stream_changes_to_index,
        write_corpus_mirror,
    )

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "changes_src")
    ckpt = str(tmp_path / "ckpt")
    corpus = synth_corpus(spark, 150)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    write_corpus_mirror(spark, idx, corpus, n_buckets=8)

    docs0 = spark.read.parquet(f"{idx}/docs")
    victims = docs0.orderBy("doc_id").limit(2).collect()
    upd_key = (victims[0]["repo"], victims[0]["path"])
    del_key = (victims[1]["repo"], victims[1]["path"])

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("action", StringType()), StructField("commit", StringType()),
        StructField("lang", StringType()), StructField("content", StringType()),
        StructField("seq_no", IntegerType()),
    ])
    new_content = "streameddelta zzpulsedelta zzpulsedelta buffer"
    batch1 = [(upd_key[0], upd_key[1], "index", "c1", "python", new_content, 2001),
              (del_key[0], del_key[1], "delete", None, None, None, 2002)]
    batch2 = [("orgD/deltarepo", "src/d.py", "index", "c2", "go",
               "deltainserted zzvortexdelta parser", 2003)]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src)
    q = stream_changes_to_index(
        spark, src, schema, idx, ckpt, available_now=True,
        apply_strategy="delta", auto_fold=False,
    )
    q.awaitTermination(120)
    assert has_segments(spark, IndexPaths(idx))
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_changes_to_index(
        spark, src, schema, idx, ckpt, available_now=True,
        apply_strategy="delta", auto_fold=False,
    )
    q2.awaitTermination(120)

    view = read_docs(spark, idx)
    assert view.filter(
        (F.col("repo") == del_key[0]) & (F.col("path") == del_key[1])
    ).count() == 0
    assert view.filter(F.col("repo") == "orgD/deltarepo").count() == 1
    assert view.count() == 150

    # pre-fold: the streamed tokens are queryable through the segments
    bq = BM25Query(spark, idx)
    assert bq.topk_pruned("zzpulsedelta", 5).count() > 0
    assert bq.topk_pruned("zzvortexdelta", 5).count() > 0

    # fold and assert full rank identity vs the python oracle
    fold_segments(spark, idx)
    mirror = spark.read.parquet(f"{idx}/_corpus")
    id_rows = read_docs(spark, idx).select("doc_id", "repo", "path").join(
        mirror.select("repo", "path", "content"), ["repo", "path"]
    ).collect()
    assert len(id_rows) == 150
    toks = {int(r["doc_id"]): tokenize_py(r["content"]) for r in id_rows}
    for qtext in ["zzpulsedelta buffer", "zzvortexdelta", "getvalue index"]:
        want = bm25_oracle(toks, tokenize_py(qtext), 10)
        got = [(int(r["doc_id"]), float(r["score"]))
               for r in bq.topk_pruned(qtext, 10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], qtext


def test_stream_auto_fold_triggers(spark, tmp_path):
    """auto_fold (default) must actually FOLD inside the micro-batch when
    the delta area passes the compaction-pressure threshold: a batch
    updating >20% of a small corpus leaves NO pending segments after the
    drain, and the folded index answers exactly."""
    import warnings

    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.index.builder import IndexPaths
    from go_dcp_elasticsearch_spark.index.segments import has_segments
    from go_dcp_elasticsearch_spark.streaming.pipeline import (
        stream_changes_to_index,
        write_corpus_mirror,
    )

    idx = str(tmp_path / "idx")
    src = str(tmp_path / "changes_src")
    ckpt = str(tmp_path / "ckpt")
    corpus = synth_corpus(spark, 60)
    IndexBuilder(spark, idx, n_shards=2).build(corpus)
    write_corpus_mirror(spark, idx, corpus, n_buckets=4)

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("action", StringType()), StructField("commit", StringType()),
        StructField("lang", StringType()), StructField("content", StringType()),
        StructField("seq_no", IntegerType()),
    ])
    # update 20 of 60 docs in one micro-batch: the segment writes 20 alive
    # + 20 tombstone rows = 40/60 > COMPACT_RECOMMEND_FRACTION
    victims = spark.read.parquet(f"{idx}/docs").orderBy("doc_id").limit(20).collect()
    batch = [
        (r["repo"], r["path"], "index", "c9", "python",
         f"zzautofold body {i}", 3000 + i)
        for i, r in enumerate(victims)
    ]
    spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the pressure warning is expected
        q = stream_changes_to_index(
            spark, src, schema, idx, ckpt, available_now=True,
            apply_strategy="delta",  # auto_fold defaults True
        )
        q.awaitTermination(120)
    assert not has_segments(spark, IndexPaths(idx))  # folded in-batch
    bq = BM25Query(spark, idx)
    assert bq.topk_pruned("zzautofold", 25).count() == 20

    # invalid strategy fails fast at the call site, not inside the stream
    import pytest as _pytest

    with _pytest.raises(ValueError, match="apply_strategy"):
        stream_changes_to_index(
            spark, src, schema, idx, ckpt, apply_strategy="Delta"
        )
