"""Metrics table (SURVEY.md A17).

Parity with the reference's per-index {index,delete} x {success,error}
Prometheus counters and latency gauges (elasticsearch/bulk/bulk.go:56-63,
572-594; metric/collector.go:82-101). Instead of a scrape endpoint, counters
land as appended rows in a ``_metrics`` Parquet table; a dashboard is a
``groupBy`` away.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from go_dcp_elasticsearch_spark.plans.lineage import METRICS_SCHEMA


class MetricsLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def record(
        self,
        stage: str,
        index_name: str,
        action: str,
        result: str,
        count: int,
        latency_ms: float = 0.0,
    ) -> None:
        row = [
            (
                stage,
                index_name,
                action,
                result,
                int(count),
                float(latency_ms),
                datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None),
            )
        ]
        df = self.spark.createDataFrame(row, schema=METRICS_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.path)

    def record_counts(self, df: DataFrame) -> None:
        """Append a pre-aggregated counters DataFrame (must match schema
        minus recorded_at)."""
        from pyspark.sql import functions as F

        df.withColumn("recorded_at", F.current_timestamp()).write.mode("append").parquet(
            self.path
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
