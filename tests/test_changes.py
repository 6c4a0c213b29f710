"""Change-feed application (B1-B4): upsert/delete/partial/script semantics,
LWW within feed, replay idempotency (the reference's at-least-once model)."""

from __future__ import annotations

import pandas as pd

from go_dcp_elasticsearch_spark.sources.changes import apply_changes


def _state(spark):
    return spark.createDataFrame(
        [("k1", "old1", "mA"), ("k2", "old2", "mB"), ("k3", "old3", "mC")],
        "key string, content string, meta string",
    )


def _apply(spark, state, changes_rows):
    changes = spark.createDataFrame(
        changes_rows, "key string, action string, content string, seq_no long"
    )
    out = apply_changes(state, changes, ["key"], "content", "seq_no")
    return {r["key"]: (r["content"], r["meta"]) for r in out.collect()}


def test_index_replaces_and_inserts(spark):
    got = _apply(spark, _state(spark), [("k1", "index", "new1", 1), ("k9", "index", "new9", 1)])
    assert got["k1"] == ("new1", "mA")  # replaced, meta kept
    assert got["k9"] == ("new9", None)  # inserted
    assert got["k2"] == ("old2", "mB")  # untouched


def test_delete_tombstones(spark):
    got = _apply(spark, _state(spark), [("k2", "delete", None, 1)])
    assert "k2" not in got
    assert set(got) == {"k1", "k3"}


def test_doc_update_upserts(spark):
    # doc_as_upsert (document.go:59-82): merge if exists, insert if absent
    got = _apply(
        spark, _state(spark),
        [("k3", "doc_update", "patched3", 1), ("k8", "doc_update", "fresh8", 1)],
    )
    assert got["k3"] == ("patched3", "mC")
    assert got["k8"] == ("fresh8", None)


def test_script_update(spark):
    # scripted_upsert (document.go:84-101): arbitrary per-doc transform
    def script(old: pd.Series, new: pd.Series) -> pd.Series:
        return old.fillna("") + "+" + new.fillna("")

    changes = spark.createDataFrame(
        [("k1", "script_update", "suffix", 1)],
        "key string, action string, content string, seq_no long",
    )
    out = apply_changes(_state(spark), changes, ["key"], "content", "seq_no", script=script)
    got = {r["key"]: r["content"] for r in out.collect()}
    assert got["k1"] == "old1+suffix"


def test_lww_within_feed(spark):
    # bulk.go:179-195: newest per key wins within one batch
    got = _apply(
        spark, _state(spark),
        [("k1", "index", "v1", 1), ("k1", "delete", None, 2), ("k1", "index", "v3", 3)],
    )
    assert got["k1"][0] == "v3"


def test_replay_idempotent(spark):
    # at-least-once: re-applying the same feed yields identical state
    feed = [("k1", "index", "new1", 5), ("k2", "delete", None, 6)]
    once = _apply(spark, _state(spark), feed)
    state2 = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in once.items()], "key string, content string, meta string"
    )
    twice = _apply(spark, state2, feed)
    assert once == twice


def test_json_field_merge_doc_update(spark):
    # B3 proper: partial JSON docs merge field-wise (ES doc_as_upsert)
    state = spark.createDataFrame(
        [("k1", '{"a":"1","b":"2"}', "m")], "key string, content string, meta string"
    )
    changes = spark.createDataFrame(
        [("k1", "doc_update", '{"b":"9","c":"3"}', 1),
         ("k2", "doc_update", '{"x":"y"}', 1)],
        "key string, action string, content string, seq_no long",
    )
    out = apply_changes(state, changes, ["key"], "content", "seq_no", json_doc_update=True)
    import json as _json

    got = {r["key"]: _json.loads(r["content"]) for r in out.collect()}
    assert got["k1"] == {"a": "1", "b": "9", "c": "3"}  # b overwritten, a kept
    assert got["k2"] == {"x": "y"}  # upsert path


def test_apply_changes_to_index_end_to_end(spark, tmp_path):
    """B1-B4 incremental maintenance: update + delete + insert -> only
    affected shards rebuilt; queries over the updated index are
    rank-identical to a FULL rebuild of the post-change corpus state
    (same doc ids preserved for survivors)."""
    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_oracle
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index
    from pyspark.sql import functions as F

    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 200)
    IndexBuilder(spark, idx, n_shards=4).build(corpus)
    docs0 = spark.read.parquet(f"{idx}/docs")
    victims = docs0.orderBy("doc_id").limit(2).collect()
    upd_key = (victims[0]["repo"], victims[0]["path"])
    del_key = (victims[1]["repo"], victims[1]["path"])

    # post-change corpus: victim0 rewritten, victim1 dropped, one insert
    new_content = "quasarFlux quasarFlux freshlyUpdatedContent buffer"
    changed = (
        corpus.filter(~((F.col("repo") == del_key[0]) & (F.col("path") == del_key[1])))
        .withColumn(
            "content",
            F.when(
                (F.col("repo") == upd_key[0]) & (F.col("path") == upd_key[1]),
                F.lit(new_content),
            ).otherwise(F.col("content")),
        )
    )
    insert_row = spark.createDataFrame(
        [("orgZ/newrepo", "src/new.py", "c0ffee", "python",
          "brandNewDocument kraken_sentinel parser", 999)],
        "repo string, path string, commit string, lang string, content string, seq_no int",
    )
    new_corpus = changed.unionByName(insert_row)

    changes = spark.createDataFrame(
        [
            (upd_key[0], upd_key[1], "index", 10),
            (del_key[0], del_key[1], "delete", 11),
            ("orgZ/newrepo", "src/new.py", "index", 12),
        ],
        "repo string, path string, action string, seq_no long",
    )
    out = apply_changes_to_index(spark, idx, new_corpus, changes)
    assert out["n_changed"] == 3
    assert out["n_docs"] == 200  # 200 - 1 delete + 1 insert

    # deleted doc gone, updated content sha refreshed, insert present
    docs1 = spark.read.parquet(f"{idx}/docs")
    assert docs1.filter(
        (F.col("repo") == del_key[0]) & (F.col("path") == del_key[1])
    ).count() == 0
    assert docs1.filter(F.col("repo") == "orgZ/newrepo").count() == 1

    # rank identity vs python oracle over the post-change state with the
    # index's own id mapping
    id_rows = docs1.select("doc_id", "repo", "path").join(
        new_corpus.select("repo", "path", "content"), ["repo", "path"]
    ).collect()
    docs_tokens = {int(r["doc_id"]): tokenize_py(r["content"]) for r in id_rows}
    q = BM25Query(spark, idx)
    assert q.ub_scale >= 1.0
    for qtext in ["quasarFlux buffer", "kraken_sentinel", "getValue", new_content]:
        want = bm25_oracle(docs_tokens, tokenize_py(qtext), 10)
        got = [(int(r["doc_id"]), float(r["score"])) for r in q.topk_pruned(qtext, 10).collect()]
        assert [g[0] for g in got] == [w[0] for w in want], qtext
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9
