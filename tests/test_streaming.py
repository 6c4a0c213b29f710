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
