"""Round-2 parity: B5 routing (envelope bytes, action key, placement),
A15 attempted-vs-committed reconciliation, A14 bounded-retry conf.

Golden strings mirror bulk_test.go:38-84 (routing / typed index) and
Test_getActionKey_clusterKey (bulk_test.go:187-209).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.operators.dispatch import (
    action_key,
    dedup_bulk_actions,
    route_placement,
    serialize_bulk_ndjson,
)


def _actions(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_key string, action string, source string, index_name string, routing string",
    )


class TestRoutingEnvelope:
    def test_routing_index_action(self, spark):
        # bulk_test.go:51-67: {"index":{"_index":"idx","_id":"id","routing":"r"}}
        df = _actions(spark, [("doc-1", "index", '{"a":1}', "idx", "shard-7")])
        line = serialize_bulk_ndjson(df, routing_col="routing").collect()[0]["bulk_line"]
        meta, body = line.split("\n")
        assert meta == '{"index":{"_index":"idx","_id":"doc-1","routing":"shard-7"}}'
        assert json.loads(body) == {"a": 1}

    def test_null_routing_omitted(self, spark):
        df = _actions(spark, [("doc-1", "index", '{"a":1}', "idx", None)])
        line = serialize_bulk_ndjson(df, routing_col="routing").collect()[0]["bulk_line"]
        assert line.split("\n")[0] == '{"index":{"_index":"idx","_id":"doc-1"}}'

    def test_typed_index_action(self, spark):
        # bulk_test.go:69-84: ...,"_type":"_doc"}}
        df = _actions(spark, [("doc-1", "index", '{"a":1}', "idx", None)])
        line = serialize_bulk_ndjson(df, type_name="_doc").collect()[0]["bulk_line"]
        assert line.split("\n")[0] == '{"index":{"_index":"idx","_id":"doc-1","_type":"_doc"}}'

    def test_routing_then_type_order(self, spark):
        # getEsActionJSON appends routing BEFORE _type (bulk.go:244-253)
        df = _actions(spark, [("d", "delete", None, "idx", "r1")])
        line = serialize_bulk_ndjson(df, routing_col="routing", type_name="_doc").collect()[0][
            "bulk_line"
        ]
        assert line == '{"delete":{"_index":"idx","_id":"d","routing":"r1","_type":"_doc"}}'


class TestActionKey:
    def test_key_variants(self, spark):
        # Test_getActionKey_clusterKey: "eu::1:idx" and "eu::1:idx:r"
        df = spark.createDataFrame(
            [("1", "idx", None, "eu"), ("1", "idx", "r", "eu"),
             ("1", "idx", "r", None), ("1", "idx", None, "default")],
            "doc_key string, index_name string, routing string, cluster string",
        )
        got = [
            r["k"]
            for r in df.select(
                action_key("doc_key", "index_name", "routing", "cluster").alias("k")
            ).collect()
        ]
        assert got == ["eu::1:idx", "eu::1:idx:r", "1:idx:r", "1:idx"]

    def test_dedup_uses_routing_in_key(self, spark):
        # same (id, index) but DIFFERENT routing = two distinct actions;
        # same routing dedups to the newest (bulk.go:179-195,596-608)
        df = spark.createDataFrame(
            [("1", "idx", "rA", 1, "old"), ("1", "idx", "rA", 2, "new"),
             ("1", "idx", "rB", 1, "keepB")],
            "doc_key string, index_name string, routing string, seq_no long, payload string",
        )
        out = dedup_bulk_actions(df, "seq_no", routing_col="routing")
        got = {(r["routing"], r["payload"]) for r in out.collect()}
        assert got == {("rA", "new"), ("rB", "keepB")}


class TestRoutingPlacement:
    def test_route_placement_colocates(self, spark):
        df = spark.createDataFrame(
            [(str(i), f"r{i % 3}") for i in range(60)], "doc_key string, routing string"
        )
        placed = route_placement(df, "routing", n_partitions=6).withColumn(
            "pid", F.spark_partition_id()
        )
        # every routing value maps to exactly one partition
        spread = placed.groupBy("routing").agg(
            F.count_distinct("pid").alias("n_pids")
        ).collect()
        assert all(r["n_pids"] == 1 for r in spread)

    def test_builder_routing_mode_rank_identity(self, spark, tmp_path):
        """B5 placement inside the index build: shard = hash(routing);
        co-routed docs share a shard and BM25 results stay rank-identical
        to the range-sharded build."""
        from go_dcp_elasticsearch_spark.corpus import synth_corpus
        from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder

        corpus = synth_corpus(spark, 300).withColumn("routing", F.col("repo"))
        idx_a = str(tmp_path / "range")
        idx_b = str(tmp_path / "routed")
        IndexBuilder(spark, idx_a, n_shards=4).build(corpus)
        IndexBuilder(spark, idx_b, n_shards=4, routing_col="routing").build(corpus)

        docs_b = spark.read.parquet(f"{idx_b}/docs")
        # co-location: each repo (routing key) lives in exactly one shard
        spread = docs_b.join(
            corpus.select("repo", "path").withColumnRenamed("repo", "r"),
            (F.col("repo") == F.col("r")) & (docs_b["path"] == corpus["path"]),
        )
        per_key = docs_b.groupBy("repo").agg(
            F.count_distinct("shard").alias("n_shards")
        ).collect()
        assert all(r["n_shards"] == 1 for r in per_key)
        # and >1 shard used overall (placement actually distributes)
        assert docs_b.select("shard").distinct().count() > 1

        qa = BM25Query(spark, idx_a)
        qb = BM25Query(spark, idx_b)
        for qtext in ["getValue buffer", "kraken_sentinel", "parseInput index"]:
            ra = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in qa.topk_pruned(qtext, 10).collect()]
            rb = [(int(r["doc_id"]), round(float(r["score"]), 9))
                  for r in qb.topk_pruned(qtext, 10).collect()]
            assert ra == rb, qtext


class TestReconcile:
    def test_partial_write_reconciliation(self, spark, tmp_path):
        """A15: inject a partial write (sink holds a subset) — reconcile
        returns exactly the uncommitted keys (bulk.go:431-497 parity)."""
        from go_dcp_elasticsearch_spark.operators.sink_handler import reconcile_sink

        sink = str(tmp_path / "sink")
        attempted = spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(10)], "doc_key string, payload string"
        )
        attempted.filter(F.col("doc_key").isin(["0", "1", "2", "3", "4", "5", "6"])) \
            .write.parquet(sink)
        missing = reconcile_sink(spark, attempted, sink, ["doc_key"])
        assert {r["doc_key"] for r in missing.collect()} == {"7", "8", "9"}

    def test_run_sink_verify_clean(self, spark, tmp_path):
        from go_dcp_elasticsearch_spark.operators.sink_handler import run_sink

        sink = str(tmp_path / "sink2")
        df = spark.createDataFrame(
            [(str(i), f"v{i}") for i in range(5)], "doc_key string, payload string"
        )
        out = run_sink(df, sink, verify_keys=["doc_key"])
        assert out["written"] == 5 and out["uncommitted"] == 0


def test_engine_conf_max_retries():
    """A14: maxRetries (config/config.go:76-78) -> spark.task.maxFailures."""
    from go_dcp_elasticsearch_spark.config import IndexConfig, engine_conf

    assert engine_conf(IndexConfig()) == {}
    assert engine_conf(IndexConfig(max_retries=3)) == {"spark.task.maxFailures": "4"}
    assert engine_conf(IndexConfig(max_retries=0)) == {"spark.task.maxFailures": "1"}


class TestRunScopedReconcile:
    def test_prior_run_commit_does_not_mask_lost_write(self, spark, tmp_path):
        """A key committed by run 1 must still be reported uncommitted when
        run 2's write of the SAME key is lost — the committed side of the
        anti-join is scoped to the current run's _run_id partition."""
        from go_dcp_elasticsearch_spark.operators.sink_handler import (
            reconcile_sink,
            run_sink,
        )

        sink = str(tmp_path / "sink3")
        df = spark.createDataFrame(
            [("a", "v1"), ("b", "v1")], "doc_key string, payload string"
        )
        out1 = run_sink(df, sink, verify_keys=["doc_key"], run_id="run1")
        assert out1["written"] == 2 and out1["uncommitted"] == 0

        # run 2 attempts both keys but NOTHING lands (simulated lost write:
        # we never call run_sink, just reconcile the attempted set)
        attempted = spark.createDataFrame(
            [("a", "v2"), ("b", "v2")], "doc_key string, payload string"
        )
        missing_scoped = reconcile_sink(
            spark, attempted, sink, ["doc_key"], run_id="run2"
        )
        assert {r["doc_key"] for r in missing_scoped.collect()} == {"a", "b"}
        # the UNSCOPED check is vacuous here — documents the failure mode
        assert reconcile_sink(spark, attempted, sink, ["doc_key"]).count() == 0

    def test_run_sink_partial_second_run(self, spark, tmp_path):
        """Partial second-run write over keys run 1 already committed:
        verify_keys catches exactly the lost ones."""
        from go_dcp_elasticsearch_spark.operators.sink_handler import (
            reconcile_sink,
            run_sink,
        )

        sink = str(tmp_path / "sink4")
        keys = [(str(i), "v1") for i in range(6)]
        run_sink(
            spark.createDataFrame(keys, "doc_key string, payload string"),
            sink, run_id="r1",
        )
        # run 2 re-writes all 6; simulate a partial landing by writing only
        # 4 of them under r2's partition, then reconciling the full set
        df2 = spark.createDataFrame(
            [(str(i), "v2") for i in range(6)], "doc_key string, payload string"
        )
        df2.filter(F.col("doc_key") < "4").withColumn(
            "_run_id", F.lit("r2")
        ).write.mode("append").partitionBy("_run_id").parquet(sink)
        missing = reconcile_sink(spark, df2, sink, ["doc_key"], run_id="r2")
        assert {r["doc_key"] for r in missing.collect()} == {"4", "5"}


def test_run_sink_refuses_legacy_unpartitioned_sink(spark, tmp_path):
    """Review regression (round 3): appending a _run_id-partitioned write
    into a sink holding root-level parquet would make Spark silently drop
    every legacy row — run_sink must refuse with a migration hint."""
    import pytest

    from go_dcp_elasticsearch_spark.operators.sink_handler import run_sink

    sink = str(tmp_path / "legacy_sink")
    legacy = spark.createDataFrame([("a", "v0")], "doc_key string, payload string")
    legacy.write.parquet(sink)  # unpartitioned root-level files
    df = spark.createDataFrame([("b", "v1")], "doc_key string, payload string")
    with pytest.raises(ValueError, match="unpartitioned"):
        run_sink(df, sink)
    # legacy rows still intact and readable
    assert spark.read.parquet(sink).count() == 1
