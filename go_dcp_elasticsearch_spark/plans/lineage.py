"""Lineage/checkpoint log (SURVEY.md A18).

The reference forces DCP checkpointing to manual (connector.go:186) and
commits vBucket offsets only AFTER the sink acknowledged the flushed batch
(bulk.go:320-332); crash before commit => replay => at-least-once, made
idempotent by keyed upserts (docs/06_bulk_processor_.md:98).

Batch-engine equivalent: each build stage writes its output as a
deterministic partition overwrite, then appends one lineage record. Resume =
skip stages whose lineage records exist; a partially-written stage without a
record is simply overwritten on re-run (idempotent).

Storage: a driver-side JSONL commit log (one fsync'd line per commit) — the
direct analogue of the reference's checkpoint documents, and O(ms) instead
of a Spark job per commit. ``read()`` exposes it as a DataFrame.
"""

from __future__ import annotations

import datetime
import json
import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("stage", StringType(), False),
        StructField("partition_id", LongType(), False),
        StructField("rows_out", LongType(), False),
        StructField("run_id", StringType(), False),
        StructField("committed_at", StringType(), False),
    ]
)


class LineageLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.file = f"{self.path}/lineage.jsonl"
        self.run_id = uuid.uuid4().hex[:12]

    def commit(self, stage: str, partition_id: int, rows_out: int) -> None:
        os.makedirs(self.path, exist_ok=True)
        rec = {
            "stage": stage,
            "partition_id": int(partition_id),
            "rows_out": int(rows_out),
            "run_id": self.run_id,
            "committed_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        with open(self.file, "a") as f:
            f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def _records(self) -> list[dict]:
        if not os.path.exists(self.file):
            return []
        with open(self.file) as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed_stages(self) -> set[str]:
        return {r["stage"] for r in self._records()}

    def completed_partitions(self, stage: str) -> set[int]:
        return {r["partition_id"] for r in self._records() if r["stage"] == stage}

    def read(self):
        recs = self._records()
        return self.spark.createDataFrame(
            [tuple(r[f.name] for f in LINEAGE_SCHEMA.fields) for r in recs],
            schema=LINEAGE_SCHEMA,
        )


METRICS_SCHEMA = StructType(  # re-exported for plans.metrics
    [
        StructField("stage", StringType(), False),
        StructField("index_name", StringType(), False),
        StructField("action", StringType(), False),
        StructField("result", StringType(), False),
        StructField("count", LongType(), False),
        StructField("latency_ms", DoubleType(), False),
        StructField("recorded_at", StringType(), False),
    ]
)
