"""Change-feed application: upsert / delete / partial update / script update
(SURVEY.md B1-B4) — the write-side API the reference drives against
Elasticsearch, applied to our own forward store.

Reference parity:
- Index (full replace): document.go:40-57, NDJSON bulk.go:234-235.
- Delete by id: document.go:23-38.
- DocUpdate with doc_as_upsert: document.go:59-82, bulk.go:221.
- ScriptUpdate with scripted_upsert: document.go:84-101 (painless example
  example/script-update/main.go:13) — arbitrary per-doc transform, here a
  vectorized pandas UDF applied inside the merge.
- Ordering authority: within one feed the newest seq_no per key wins
  (bulk.go:179-195); across feeds, application is idempotent replay
  (at-least-once semantics, docs/06_bulk_processor_.md:98).

Spark shape: no MERGE INTO without a lakehouse format on the sandbox
classpath, so the merge is the portable equivalent — full-outer join of
state with the deduped feed + per-action resolution — written as a
deterministic partition overwrite. On Iceberg the same plan lands as
``MERGE INTO`` (documented in README).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins

ACTIONS = ("index", "delete", "doc_update", "script_update")


def json_field_merge(old: "F.Column", new: "F.Column") -> "F.Column":
    """B3 proper: field-level merge of two flat JSON object strings —
    new fields overwrite, missing fields survive. This is what
    Elasticsearch does with a partial doc + doc_as_upsert
    (document.go:59-66). Declarative: from_json to map, map_concat
    (right side wins on key collision), to_json. No UDF."""
    mt = "map<string,string>"
    om = F.coalesce(F.from_json(old, mt), F.from_json(F.lit("{}"), mt))
    nm = F.coalesce(F.from_json(new, mt), F.from_json(F.lit("{}"), mt))
    return F.to_json(F.map_concat(F.map_filter(om, lambda k, _: ~F.map_contains_key(nm, k)), nm))


def apply_changes(
    state: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    value_col: str = "content",
    order_col: str = "seq_no",
    script: Callable[[pd.Series, pd.Series], pd.Series] | None = None,
    json_doc_update: bool = False,
) -> DataFrame:
    """Apply a change feed to the keyed state table.

    ``changes`` columns: key_cols..., action in ACTIONS, ``value_col``
    (new/partial content; null for delete), ``order_col``.

    Semantics per key (after LWW within the feed):
      index          -> replace value (insert if absent)
      delete         -> drop row (tombstone)
      doc_update     -> doc_as_upsert: new value if state absent, else
                        merge (here: replace value, keep other state
                        columns — column-level merge for structured docs)
      script_update  -> scripted_upsert: script(old_value?, change_value)
    """
    feed = last_write_wins(changes, key_cols, order_col)
    feed = feed.select(
        *key_cols, F.col("action"), F.col(value_col).alias("_new_val"), F.col(order_col)
    )
    st = state.alias("s")
    ch = feed.alias("c")
    joined = st.join(ch, key_cols, "full_outer")

    new_val = F.col("_new_val")
    old_val = F.col(f"s.{value_col}")
    if script is not None:
        script_udf = F.pandas_udf(script, "string")
        scripted = script_udf(old_val, new_val)
    else:
        scripted = F.coalesce(new_val, old_val)

    if json_doc_update:
        doc_updated = F.when(old_val.isNull(), new_val).otherwise(
            json_field_merge(old_val, new_val)
        )
    else:
        doc_updated = F.coalesce(new_val, old_val)
    resolved = (
        F.when(F.col("action").isNull(), old_val)  # untouched state row
        .when(F.col("action") == "delete", F.lit(None))
        .when(F.col("action") == "index", new_val)
        .when(F.col("action") == "doc_update", doc_updated)
        .when(F.col("action") == "script_update", scripted)
    )
    out = joined.withColumn("_resolved", resolved).filter(F.col("_resolved").isNotNull())
    keep = [c for c in state.columns if c not in key_cols and c != value_col]
    cols = [F.col(k) for k in key_cols] + [F.col(f"s.{c}").alias(c) for c in keep]
    cols.append(F.col("_resolved").alias(value_col))
    return out.select(*cols)


def apply_changes_to_index(
    spark,
    index_dir: str,
    new_corpus: DataFrame,
    changes: DataFrame,
    key_cols: list[str] = ("repo", "path"),
    order_col: str = "seq_no",
) -> dict:
    """Incremental index maintenance (B1-B4 end-to-end): given the
    post-change corpus snapshot and the change feed, rebuild ONLY the
    posting shards whose documents changed, then refresh dictionary and
    stats.

    Mirrors the reference's recovery model — posting blocks are immutable,
    so delete/update = replay + rebuild of the affected partitions
    (tombstone + compact), not in-place mutation (SURVEY.md §7). Doc ids
    are preserved for unchanged docs: the docs table is the id authority;
    new keys get ids appended after the current max (dense, deterministic
    by key order within the delta).

    Returns {"affected_shards", "n_changed", "n_docs"}. Scale shape: the
    rebuild reads only shard-pruned docs partitions + the changed keys'
    content; dictionary/stats refresh is a column-pruned scan of postings.
    """
    from pyspark.sql import Window  # noqa: F401

    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_expr
    from go_dcp_elasticsearch_spark.index.builder import (
        CHUNK_SCHEMA,
        POSTINGS_SCHEMA,
        IndexBuilder,
    )

    key_cols = list(key_cols)
    docs_path = f"{index_dir}/docs"
    docs = spark.read.parquet(docs_path)
    n_shards = docs.agg(F.max("shard")).collect()[0][0] + 1
    feed = last_write_wins(changes, key_cols, order_col).select(
        *key_cols, "action"
    )
    feed.persist()
    n_changed = feed.count()

    # affected shards = shards of existing docs touched by the feed; plus
    # the LAST shard for inserts (new ids append past the current max)
    touched = (
        docs.join(F.broadcast(feed.select(*key_cols)), key_cols, "inner")
        .select("shard")
        .distinct()
        .collect()
    )
    affected = {int(r["shard"]) for r in touched}
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    existing_keys = docs.select(*key_cols)
    inserts = feed.filter(F.col("action") != "delete").join(
        existing_keys, key_cols, "left_anti"
    )
    n_inserts = inserts.count()
    if n_inserts:
        affected.add(n_shards - 1)
    if not affected:
        feed.unpersist()
        return {"affected_shards": [], "n_changed": n_changed, "n_docs": None}

    # new docs rows for affected shards: survivors (minus deletes) keep
    # their ids; inserts get ids max_id+1.. in key order
    w = Window.orderBy(*key_cols)
    ins_ids = inserts.withColumn(
        "doc_id", F.row_number().over(w) + F.lit(int(max_id))
    ).select(*key_cols, "doc_id")
    deletes = feed.filter(F.col("action") == "delete").select(*key_cols)
    kept = docs.join(F.broadcast(deletes), key_cols, "left_anti").select(
        *key_cols, "doc_id", "shard"
    )
    appended = ins_ids.withColumn("shard", F.lit(n_shards - 1).cast("int"))
    id_map = kept.unionByName(appended)

    # rebuild each affected shard from the post-change corpus content.
    # persist+materialize BEFORE overwriting docs: shard_corpus derives from
    # the docs table we're about to replace (read-under-overwrite hazard)
    shard_ids = id_map.filter(F.col("shard").isin([int(s) for s in affected]))
    shard_corpus = shard_ids.join(new_corpus, key_cols, "inner").persist()
    shard_corpus.count()
    b = IndexBuilder(spark, index_dir, n_shards=int(n_shards))
    srow = spark.read.parquet(b.paths.stats).collect()[0]
    old_bound_avgdl = float(
        srow["bound_avgdl"] if "bound_avgdl" in srow.asDict() else srow["avgdl"]
    )

    new_docs = shard_corpus.select(
        "doc_id",
        *key_cols,
        F.col("commit"),
        F.col("lang"),
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.size(tokenize_expr("content")).cast("long").alias("doc_len"),
        F.col("shard"),
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        new_docs.repartition(len(affected), F.col("shard")).write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(docs_path)

        # NEW avgdl first: the rebuilt shards' block-max bounds must be
        # computed under the avgdl queries will actually use
        stats_row = (
            spark.read.parquet(docs_path)
            .agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
            .collect()[0]
        )
        n_docs_total = int(stats_row["n_docs"])
        avgdl_new = float(stats_row["avgdl"])

        chunks = shard_corpus.select("doc_id", "content", "shard").mapInPandas(
            _chunks_with_fixed_shard(b, avgdl_new), schema=CHUNK_SCHEMA
        )
        postings = chunks.repartition(
            max(len(affected) * 4, 8), F.col("term"), F.col("shard")
        ).mapInPandas(b._merge_chunks(avgdl_new), schema=POSTINGS_SCHEMA)
        postings.repartition(len(affected), F.col("shard")).sortWithinPartitions(
            "term", "block_id"
        ).write.mode("overwrite").partitionBy("shard").parquet(b.paths.postings)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # refresh dictionary + stats; bound_avgdl = smallest avgdl any live
    # block bound was computed under (untouched shards keep old bounds)
    spark.read.parquet(b.paths.postings).groupBy("term").agg(
        F.sum("count").alias("df"), F.sum("tf_sum").alias("cf")
    ).write.mode("overwrite").parquet(b.paths.dictionary)
    bound_avgdl = min(old_bound_avgdl, avgdl_new)
    spark.createDataFrame(
        [(n_docs_total, avgdl_new, bound_avgdl, b.index_name)],
        "n_docs long, avgdl double, bound_avgdl double, index_name string",
    ).coalesce(1).write.mode("overwrite").parquet(b.paths.stats)
    b.lineage.commit("incremental", -1, n_changed)
    shard_corpus.unpersist()
    feed.unpersist()
    return {
        "affected_shards": sorted(affected),
        "n_changed": n_changed,
        "n_docs": n_docs_total,
    }


def _chunks_with_fixed_shard(builder, avgdl: float):
    """Chunk kernel variant that uses the precomputed ``shard`` column
    (shard assignments are preserved from the original build, so the
    range-shard formula can't be reapplied after inserts)."""
    import numpy as np
    import pandas as pd

    from go_dcp_elasticsearch_spark.functions.bm25 import B, K1
    from go_dcp_elasticsearch_spark.functions.codec import BLOCK_SIZE, encode_blocks_bulk
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.index.builder import CHUNK_SCHEMA

    cols = [f.name for f in CHUNK_SCHEMA.fields]

    def kernel(iterator):
        from collections import Counter

        rows = []
        for pdf in iterator:
            pdf = pdf.sort_values("doc_id")
            for did, content, sh in zip(pdf["doc_id"], pdf["content"], pdf["shard"]):
                c = Counter(tokenize_py(content))
                dl = sum(c.values())
                for t, tf in c.items():
                    rows.append((t, int(sh), int(did), tf, dl))
        if not rows:
            return
        pdf = pd.DataFrame(rows, columns=["term", "shard", "doc_id", "tf", "dl"])
        pdf = pdf.sort_values(["term", "shard", "doc_id"], kind="mergesort")
        out = []
        for (t, sh), g in pdf.groupby(["term", "shard"], sort=False):
            ids = g["doc_id"].to_numpy()
            tfs = g["tf"].to_numpy()
            dls = g["dl"].to_numpy()
            tf_f = tfs.astype(np.float64)
            tf_norm = tf_f / (tf_f + K1 * (1.0 - B + B * dls / avgdl))
            blocks = encode_blocks_bulk(ids, tfs, dls)
            bmax = np.maximum.reduceat(tf_norm, np.arange(0, len(ids), BLOCK_SIZE))
            for bi, (ids_vb, tfs_vb, dls_vb, cnt, max_id, max_tf, tf_sum) in enumerate(blocks):
                out.append(
                    (t, int(sh), int(ids[bi * BLOCK_SIZE]), ids_vb, tfs_vb, dls_vb,
                     cnt, max_id, max_tf, tf_sum, float(bmax[bi]))
                )
        yield pd.DataFrame(out, columns=cols)

    return kernel


def incremental_index_delta(
    spark,
    index_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    value_col: str = "content",
    order_col: str = "seq_no",
) -> dict:
    """Incremental index maintenance: apply a change feed and rebuild ONLY
    the shards whose documents changed (partition-scoped rebuild — the
    batch analogue of the reference replaying a vBucket from checkpoint).

    Returns {"affected_shards": [...], "n_changed": int}. Full rebuild of
    affected shards mirrors the tombstone + compact model in SURVEY.md §7;
    posting blocks are immutable, so delete/update = rebuild of the
    affected doc partitions, not in-place mutation.
    """
    docs = spark.read.parquet(f"{index_dir}/docs")
    feed = last_write_wins(changes, key_cols, order_col)
    affected = (
        docs.join(feed.select(*key_cols).distinct(), key_cols, "inner")
        .select("shard")
        .distinct()
        .collect()
    )
    return {
        "affected_shards": sorted(r["shard"] for r in affected),
        "n_changed": feed.count(),
    }
