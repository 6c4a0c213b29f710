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


def action_key(
    doc_key: Column | str = "doc_key",
    index_name: Column | str = "index_name",
    routing_col: Column | str | None = None,
    cluster_key_col: Column | str | None = None,
) -> Column:
    """B5/A7: the reference's batch-dedup action key (bulk.go:596-608):
    ``id:index``, plus ``:routing`` when routing is set, prefixed with
    ``clusterKey::`` when the (normalized) cluster key is non-empty."""
    col = lambda c: F.col(c) if isinstance(c, str) else c  # noqa: E731
    base = F.concat_ws(":", col(doc_key), col(index_name))
    if routing_col is not None:
        r = col(routing_col)
        base = F.when(r.isNotNull(), F.concat_ws(":", base, r)).otherwise(base)
    if cluster_key_col is not None:
        ck = col(cluster_key_col)
        # "default" aliases the primary cluster '' (config.go:14-20)
        ck = F.when(ck == "default", F.lit("")).otherwise(F.coalesce(ck, F.lit("")))
        base = F.when(ck != "", F.concat(ck, F.lit("::"), base)).otherwise(base)
    return base


def dedup_bulk_actions(
    actions: DataFrame,
    order_col: str,
    routing_col: str | None = None,
    cluster_key_col: str | None = None,
) -> DataFrame:
    """A7 with the FULL reference action key (incl. routing + cluster key):
    one action per key, newest wins — replace-in-place semantics of
    bulk.go:179-195 expressed as a keyed window."""
    from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins

    keyed = actions.withColumn(
        "_action_key",
        action_key("doc_key", "index_name", routing_col, cluster_key_col),
    )
    return last_write_wins(keyed, ["_action_key"], order_col).drop("_action_key")


def route_placement(
    actions: DataFrame, routing_col: str = "routing", n_partitions: int | None = None
) -> DataFrame:
    """B5 placement: co-locate all actions sharing a routing value in one
    partition (Elasticsearch routes a document to a shard by
    hash(routing); the Spark analogue is a hash repartition on the routing
    column, so per-shard writers see all docs of a routing key together).
    Null routing falls back to the doc key when present (ES uses _id)."""
    key = F.coalesce(F.col(routing_col), *(
        [F.col("doc_key")] if "doc_key" in actions.columns else [F.lit("")]
    ))
    if n_partitions is None:
        return actions.repartition(key)
    return actions.repartition(n_partitions, key)


def serialize_bulk_ndjson(
    actions: DataFrame,
    routing_col: str | None = None,
    type_name: str | None = None,
) -> DataFrame:
    """A8: render the ES Bulk wire format per action (bulk.go:230-273).

    index  -> {"index":{"_index":"<idx>","_id":"<id>"}}\\n<source>
    delete -> {"delete":{"_index":"<idx>","_id":"<id>"}}
    doc_update -> {"update":...}\\n{"doc":<source>,"doc_as_upsert":true}
    With ``routing_col``: ``","routing":"<routing>`` is appended after the
    id for rows with non-null routing (bulk.go:246-249); with
    ``type_name``: ``","_type":"<type>`` after that (bulk.go:251-253,
    legacy typed indices) — byte-identical to getEsActionJSON.
    Deterministic literal concatenation (not to_json) so the bytes are
    reproducible in ANSI SQL for the oracle check.
    """
    routing_part = (
        F.when(
            F.col(routing_col).isNotNull(),
            F.concat(F.lit('","routing":"'), F.col(routing_col)),
        ).otherwise(F.lit(""))
        if routing_col is not None
        else F.lit("")
    )
    type_part = F.lit('","_type":"' + type_name if type_name else "")
    meta = lambda verb: F.concat(  # noqa: E731
        F.lit('{"' + verb + '":{"_index":"'),
        F.col("index_name"),
        F.lit('","_id":"'),
        escape_doc_id("doc_key"),
        routing_part,
        type_part,
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
