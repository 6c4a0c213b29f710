"""Rejection log — dead-letter table (SURVEY.md A16).

Parity with RejectionLogSinkResponseHandler: on a per-item sink error the
reference writes {Index, Action, Error, Source?, DocumentID} into a
``cbes-rejects`` index it auto-creates
(elasticsearch/rejection_log_sink_response_handler.go:20-111). Here failed
rows append to a ``_rejects`` Parquet table; ``includeSource`` mirrors the
reference's RejectionLogIndex.IncludeSource config.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

REJECTS_SCHEMA = StructType(
    [
        StructField("doc_key", StringType(), False),
        StructField("index_name", StringType(), True),
        StructField("action", StringType(), True),
        StructField("error", StringType(), True),
        StructField("source", StringType(), True),
        StructField("ts", TimestampType(), False),
    ]
)


class RejectionLog:
    def __init__(self, spark: SparkSession, path: str, include_source: bool = False):
        self.spark = spark
        self.path = path
        self.include_source = include_source

    def append(self, failed: DataFrame) -> None:
        """``failed`` columns: doc_key, index_name, action, error[, source]."""
        cols = [
            F.col("doc_key").cast("string"),
            F.col("index_name").cast("string"),
            F.col("action").cast("string"),
            F.col("error").cast("string"),
        ]
        if self.include_source and "source" in failed.columns:
            cols.append(F.col("source").cast("string"))
        else:
            cols.append(F.lit(None).cast("string").alias("source"))
        out = failed.select(*cols).withColumn("ts", F.current_timestamp())
        out.write.mode("append").parquet(self.path)

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
