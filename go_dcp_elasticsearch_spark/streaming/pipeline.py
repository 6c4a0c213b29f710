"""Streaming ingest pipeline — the reference's DCP stream role, played by
Structured Streaming (SURVEY.md A1/A10/A18).

Reference model: go-dcp delivers mutation/deletion/expiration events; the
connector maps -> batches (count/byte/time triggers, bulk.go:206-208,
118-122) -> flushes to the sink -> commits source offsets only after ack
(manual checkpointing, connector.go:186, bulk.go:320-332). Crash => replay
from last committed offset => at-least-once, idempotent keyed upserts.

Spark mapping:
- source offsets + ack-gated commit  -> ``checkpointLocation`` (offsets are
  committed only after the micro-batch's sink write returns),
- count trigger  -> ``maxFilesPerTrigger``/``maxOffsetsPerTrigger``,
- time trigger   -> ``Trigger.ProcessingTime``; drain-then-exit shutdown
  (connector.go:62-65, final synchronous flush) -> ``Trigger.AvailableNow``,
- rebalance barrier (A19, bulk.go:124-141) -> native task re-scheduling.

The micro-batch body reuses the SAME batch operators (dispatch -> map ->
LWW dedup -> sink append) — one code path for batch and streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins


def stream_changes(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    sink_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_col: str = "seq_no",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream change files from ``source_dir`` into an actions table.

    Each micro-batch is LWW-deduped per key (A7 applies within a batch in
    the reference too: bulk.go:179-195) and appended with its batch id —
    the replayable, ordered action log the indexer consumes.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        deduped = last_write_wins(batch_df, key_cols, order_col)
        (
            deduped.withColumn("_micro_batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(sink_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
