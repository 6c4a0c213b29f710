"""Event dispatch, mapping, index-name resolution, bulk serialization.

Reference parity:
- A2 event-type dispatch: the listener switch constructing a Couchbase
  Event with exactly one of IsMutated/IsDeleted/IsExpired set
  (connector.go:77-98, couchbase/event.go:27-82) -> an ``op`` column.
- A3/A4 mapper: ``Mapper: Event -> []ESActionDocument`` (mapper.go:8),
  default impl mutation->Index, deletion/expiration->Delete
  (mapper.go:10-15) -> a select + explode; custom mappers are callables
  DataFrame -> DataFrame (1->0 = filter, 1->N = explode).
- A6 index-name resolution: action.IndexName if set else
  collectionIndexMapping[collection], missing key panics
  (bulk.go:513-531) -> coalesce over a map literal + raise_error.
- A8 NDJSON serialization: the ES Bulk wire envelope built by string
  concatenation (bulk.go:211-273) -> concat of literals (kept
  byte-compatible so it is oracle-checkable).
- A9 ID escaping: escape '"' with '\\' (helper/escape.go:10-21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# action enum parity: document.go:5-12 (Index/Delete/DocUpdate/ScriptUpdate)
ACTION_INDEX = "index"
ACTION_DELETE = "delete"
ACTION_DOC_UPDATE = "doc_update"
ACTION_SCRIPT_UPDATE = "script_update"


def dispatch_events(events: DataFrame, type_col: str = "event_type") -> DataFrame:
    """A2: tag each event with exactly one op (mutation/deletion/expiration).

    The driver's ``events`` table plays the DCP stream; event_type values
    map onto the three DCP event classes the reference dispatches on.
    """
    op = (
        F.when(F.col(type_col).isin("click", "view", "signup", "purchase"), F.lit("mutation"))
        .when(F.col(type_col) == "error", F.lit("deletion"))
        .otherwise(F.lit("expiration"))
    )
    return events.withColumn("op", op)


def default_mapper(events: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """A4: mutation -> Index(key, value); deletion/expiration -> Delete(key).

    Output schema mirrors ESActionDocument (document.go:14-21):
    (action, doc_key, source, index_name?, routing?, cluster_key).
    """
    return events.select(
        F.col(key_col).cast("string").alias("doc_key"),
        F.when(F.col("op") == "mutation", F.lit(ACTION_INDEX))
        .otherwise(F.lit(ACTION_DELETE))
        .alias("action"),
        F.when(F.col("op") == "mutation", F.col(value_col).cast("string"))
        .otherwise(F.lit(None).cast("string"))
        .alias("source"),
    )


def resolve_index_name(
    actions: DataFrame,
    collection_index_mapping: dict[str, str],
    collection_col: str = "collection",
    explicit_col: str | None = "index_name",
) -> DataFrame:
    """A6: explicit index name wins; else mapping[collection]; else error.

    The tiny mapping becomes a Catalyst map literal — evaluated JVM-side,
    broadcast-free, constant-folded (vs. the reference's per-action Go map
    lookup under a lock, bulk.go:513-531).
    """
    mapping = F.create_map(
        *[x for k, v in sorted(collection_index_mapping.items()) for x in (F.lit(k), F.lit(v))]
    )
    resolved = mapping[F.col(collection_col)]
    if explicit_col and explicit_col in actions.columns:
        resolved = F.coalesce(F.col(explicit_col), resolved)
    out = actions.withColumn("index_name", resolved)
    # missing mapping panics in the reference (bulk.go:529); we fail the task
    return out.withColumn(
        "index_name",
        F.when(F.col("index_name").isNull(), F.raise_error(F.lit("index name not found")))
        .otherwise(F.col("index_name")),
    )


def escape_doc_id(col: Column | str) -> Column:
    """A9: escape '"' in doc IDs (helper/escape.go:10-21)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, '"', '\\\\"')


def serialize_bulk_ndjson(actions: DataFrame) -> DataFrame:
    """A8: render the ES Bulk wire format per action (bulk.go:230-273).

    index  -> {"index":{"_index":"<idx>","_id":"<id>"}}\\n<source>
    delete -> {"delete":{"_index":"<idx>","_id":"<id>"}}
    doc_update -> {"update":...}\\n{"doc":<source>,"doc_as_upsert":true}
    Deterministic literal concatenation (not to_json) so the bytes are
    reproducible in ANSI SQL for the oracle check.
    """
    meta = lambda verb: F.concat(  # noqa: E731
        F.lit('{"' + verb + '":{"_index":"'),
        F.col("index_name"),
        F.lit('","_id":"'),
        escape_doc_id("doc_key"),
        F.lit('"}}'),
    )
    body = F.when(F.col("action") == ACTION_INDEX, F.concat(meta(ACTION_INDEX), F.lit("\n"), F.col("source")))
    body = body.when(F.col("action") == ACTION_DELETE, meta(ACTION_DELETE))
    body = body.when(
        F.col("action") == ACTION_DOC_UPDATE,
        F.concat(meta("update"), F.lit('\n{"doc":'), F.col("source"), F.lit(',"doc_as_upsert":true}')),
    )
    body = body.otherwise(
        F.concat(meta("update"), F.lit('\n{"script":'), F.col("source"), F.lit(',"scripted_upsert":true}')),
    )
    return actions.withColumn("bulk_line", body)
