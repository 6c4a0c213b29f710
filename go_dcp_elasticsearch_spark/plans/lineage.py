"""Lineage/checkpoint table (SURVEY.md A18).

The reference forces DCP checkpointing to manual (connector.go:186) and
commits vBucket offsets only AFTER the sink acknowledged the flushed batch
(bulk.go:320-332); crash before commit => replay => at-least-once, made
idempotent by keyed upserts (docs/06_bulk_processor_.md:98).

Batch-engine equivalent: each build stage writes its output as a
deterministic partition overwrite, then appends one lineage row. Resume =
skip stages whose lineage rows exist; a partially-written stage without a
lineage row is simply overwritten on re-run (idempotent).
"""

from __future__ import annotations

import datetime
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", LongType(), False),
        StructField("rows_out", LongType(), False),
        StructField("run_id", StringType(), False),
        StructField("committed_at", TimestampType(), False),
    ]
)


class LineageLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.run_id = uuid.uuid4().hex[:12]

    def commit(self, stage: str, partition_id: int, rows_out: int) -> None:
        row = [
            (
                stage,
                int(partition_id),
                int(rows_out),
                self.run_id,
                datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
            )
        ]
        df = self.spark.createDataFrame(row, schema=LINEAGE_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def completed_stages(self) -> set[str]:
        try:
            df = self.spark.read.parquet(self.path)
        except Exception:
            return set()
        return {r["stage"] for r in df.select("stage").distinct().collect()}

    def read(self):
        return self.spark.read.parquet(self.path)


METRICS_SCHEMA = StructType(  # re-exported for plans.metrics
    [
        StructField("stage", StringType(), False),
        StructField("index_name", StringType(), False),
        StructField("action", StringType(), False),
        StructField("result", StringType(), False),
        StructField("count", LongType(), False),
        StructField("latency_ms", DoubleType(), False),
        StructField("recorded_at", TimestampType(), False),
    ]
)
