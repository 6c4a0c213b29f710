"""Operator-layer tests: dispatch/mapper/serialization golden strings
(mirroring the reference's bulk_test.go golden NDJSON fixtures),
index resolution, batching triggers, config."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.config import (
    interpolate_env,
    load_config,
    normalize_cluster_keys,
)
from go_dcp_elasticsearch_spark.operators.batching import fan_out, plan_batches
from go_dcp_elasticsearch_spark.operators.dispatch import (
    default_mapper,
    dispatch_events,
    resolve_index_name,
    serialize_bulk_ndjson,
)


def _actions_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_key string, action string, source string, index_name string"
    )


class TestSerialization:
    """Golden wire-format cases, parity with bulk_test.go:38-134."""

    def test_index_action(self, spark):
        # reference: {"index":{"_index":"idx","_id":"k"}}\n{"a":1}
        df = _actions_df(spark, [("k1", "index", '{"a":1}', "idx")])
        line = serialize_bulk_ndjson(df).collect()[0]["bulk_line"]
        meta, body = line.split("\n")
        assert json.loads(meta) == {"index": {"_index": "idx", "_id": "k1"}}
        assert json.loads(body) == {"a": 1}

    def test_delete_action(self, spark):
        df = _actions_df(spark, [("k2", "delete", None, "idx")])
        line = serialize_bulk_ndjson(df).collect()[0]["bulk_line"]
        assert json.loads(line) == {"delete": {"_index": "idx", "_id": "k2"}}

    def test_doc_update_doc_as_upsert(self, spark):
        # reference wraps partial docs {"doc":...,"doc_as_upsert":true}
        # (document.go:59-66, bulk.go:221)
        df = _actions_df(spark, [("k3", "doc_update", '{"b":2}', "idx")])
        line = serialize_bulk_ndjson(df).collect()[0]["bulk_line"]
        meta, body = line.split("\n")
        assert json.loads(meta) == {"update": {"_index": "idx", "_id": "k3"}}
        assert json.loads(body) == {"doc": {"b": 2}, "doc_as_upsert": True}

    def test_script_update_scripted_upsert(self, spark):
        # reference: {"script":...,"scripted_upsert":true} (bulk.go:215,220)
        df = _actions_df(spark, [("k4", "script_update", '{"source":"ctx._x"}', "idx")])
        line = serialize_bulk_ndjson(df).collect()[0]["bulk_line"]
        meta, body = line.split("\n")
        assert json.loads(meta) == {"update": {"_index": "idx", "_id": "k4"}}
        assert json.loads(body) == {"script": {"source": "ctx._x"}, "scripted_upsert": True}

    def test_id_escaping(self, spark):
        # helper/escape.go:10-21: '"' escaped with backslash
        df = _actions_df(spark, [('k"5', "delete", None, "idx")])
        line = serialize_bulk_ndjson(df).collect()[0]["bulk_line"]
        assert json.loads(line) == {"delete": {"_index": "idx", "_id": 'k"5'}}
        assert '\\"' in line


class TestDispatchAndMapping:
    def test_dispatch_tags_one_op(self, spark):
        ev = spark.createDataFrame(
            [(1, "click"), (2, "error"), (3, "view")], "event_id long, event_type string"
        )
        got = {r["event_id"]: r["op"] for r in dispatch_events(ev).collect()}
        assert got == {1: "mutation", 2: "deletion", 3: "view" and "mutation"}

    def test_default_mapper(self, spark):
        # mapper.go:10-15: mutation -> Index(key, value); else Delete(key)
        ev = spark.createDataFrame(
            [("a", "mutation", "v1"), ("b", "deletion", "v2"), ("c", "expiration", None)],
            "key string, op string, value string",
        )
        rows = {r["doc_key"]: (r["action"], r["source"]) for r in default_mapper(ev).collect()}
        assert rows == {"a": ("index", "v1"), "b": ("delete", None), "c": ("delete", None)}

    def test_index_resolution_explicit_wins(self, spark):
        df = spark.createDataFrame(
            [("coll1", "explicit_idx"), ("coll1", None)],
            "collection string, index_name string",
        )
        out = resolve_index_name(df, {"coll1": "mapped_idx"}).collect()
        assert sorted(r["index_name"] for r in out) == ["explicit_idx", "mapped_idx"]

    def test_index_resolution_missing_raises(self, spark):
        # bulk.go:529: missing collection mapping panics
        df = spark.createDataFrame([("unknown",)], "collection string")
        with pytest.raises(Exception, match="index name not found"):
            resolve_index_name(df, {"coll1": "idx"}, explicit_col=None).collect()


class TestBatching:
    def test_count_trigger(self, spark):
        rows = [(f"c{i % 2}", i) for i in range(25)]
        df = spark.createDataFrame(rows, "cluster_key string, seq_no long")
        out = plan_batches(df, batch_size_limit=5, size_col=None).collect()
        per = {}
        for r in out:
            per.setdefault((r["cluster_key"], r["batch_id"]), 0)
            per[(r["cluster_key"], r["batch_id"])] += 1
        # 13 and 12 rows per cluster -> batches of 5,5,3 / 5,5,2
        assert per[("c0", 0)] == 5 and per[("c0", 1)] == 5 and per[("c0", 2)] == 3
        assert per[("c1", 0)] == 5 and per[("c1", 1)] == 5 and per[("c1", 2)] == 2

    def test_byte_trigger(self, spark):
        # one 70-byte and then 40-byte rows with a 100-byte limit:
        # running bytes cross 100 at row 3 (70+40+40) -> batch increments
        rows = [("c", i, 70 if i == 0 else 40) for i in range(5)]
        df = spark.createDataFrame(rows, "cluster_key string, seq_no long, byte_size long")
        out = {
            r["seq_no"]: r["batch_id"]
            for r in plan_batches(df, batch_size_limit=1000, batch_byte_limit=100).collect()
        }
        assert out[0] == 0 and out[1] == 0  # 70, 110(starts at 70<100)
        assert out[2] >= 1  # running start 150 -> batch 1

    def test_fan_out_partitions(self, spark):
        df = spark.createDataFrame(
            [(f"k{i}", "c0") for i in range(100)], "doc_key string, cluster_key string"
        )
        out = fan_out(df, concurrent_requests=4)
        assert out.count() == 100  # repartition is lossless


class TestConfig:
    def test_env_interpolation(self, monkeypatch):
        monkeypatch.setenv("FT_TEST_VAR", "hello")
        assert interpolate_env("a ${FT_TEST_VAR} b") == "a hello b"

    def test_cluster_key_normalization(self):
        # config.go:14-20: 'default' aliases primary ''; dups rejected
        assert normalize_cluster_keys({"default": {"u": 1}}) == {"": {"u": 1}}
        with pytest.raises(ValueError):
            normalize_cluster_keys({"default": {}, "": {}})

    def test_load_from_dict_defaults(self):
        cfg = load_config({"n_shards": 4})
        assert cfg.n_shards == 4
        assert cfg.batch_size_limit == 1000  # config.go:56 default
        assert cfg.batch_byte_limit == 10 * 1024 * 1024  # config.go:64


def test_plan_batches_reset_matches_go_loop(spark):
    """plan_batches_reset == a pure-Python reimplementation of the Go
    accumulate/flush loop (bulk.go:206-208,284-318): append row; if
    count >= L or bytes >= B, flush and zero BOTH accumulators."""
    import random

    from go_dcp_elasticsearch_spark.operators.batching import plan_batches_reset

    rng = random.Random(7)
    rows = []
    for cl in ("alpha", "beta"):
        for i in range(500):
            rows.append((cl, i, rng.choice([1, 5, 40, 90, 200])))
    df = spark.createDataFrame(rows, "cluster_key string, seq_no long, byte_size long")
    L, B = 7, 300
    got = {
        (r["cluster_key"], r["seq_no"]): r["batch_id"]
        for r in plan_batches_reset(
            df, batch_size_limit=L, batch_byte_limit=B
        ).collect()
    }

    want = {}
    for cl in ("alpha", "beta"):
        count = by = bid = 0
        for cl2, seq, sz in rows:
            if cl2 != cl:
                continue
            count += 1
            by += sz
            want[(cl, seq)] = bid
            if count >= L or by >= B:
                bid += 1
                count = by = 0
    assert got == want

    # count-only degenerate case: reset == cumulative == floor(rn/L)
    got2 = {
        (r["cluster_key"], r["seq_no"]): r["batch_id"]
        for r in plan_batches_reset(
            df, size_col=None, batch_size_limit=L
        ).collect()
    }
    for cl in ("alpha", "beta"):
        seqs = sorted(s for c, s in got2 if c == cl)
        for rn, s in enumerate(seqs):
            assert got2[(cl, s)] == rn // L
