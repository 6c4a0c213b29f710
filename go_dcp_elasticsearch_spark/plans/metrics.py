"""Metrics log (SURVEY.md A17).

Parity with the reference's per-index {index,delete} x {success,error}
Prometheus counters and latency gauges (elasticsearch/bulk/bulk.go:56-63,
572-594; metric/collector.go:82-101). Counters land as appended JSONL
records (driver-side, O(ms) — these are control-plane facts, not data);
``read()`` exposes them as a DataFrame and a dashboard is a groupBy away.
``record_counts`` takes a pre-aggregated DataFrame for distributed counting.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import DataFrame, SparkSession

from go_dcp_elasticsearch_spark.plans.lineage import METRICS_SCHEMA


class MetricsLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.file = f"{self.path}/metrics.jsonl"

    def record(
        self,
        stage: str,
        index_name: str,
        action: str,
        result: str,
        count: int,
        latency_ms: float = 0.0,
    ) -> None:
        os.makedirs(self.path, exist_ok=True)
        rec = {
            "stage": stage,
            "index_name": index_name,
            "action": action,
            "result": result,
            "count": int(count),
            "latency_ms": float(latency_ms),
            "recorded_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        with open(self.file, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def record_counts(self, df: DataFrame, stage: str, latency_ms: float = 0.0) -> None:
        """Aggregate a (index_name, action, result) DataFrame distributedly,
        then append the (small) grouped counters."""
        rows = df.groupBy("index_name", "action", "result").count().collect()
        for r in rows:
            self.record(stage, r["index_name"], r["action"], r["result"], r["count"], latency_ms)

    def read(self) -> DataFrame:
        recs = []
        if os.path.exists(self.file):
            with open(self.file) as f:
                recs = [json.loads(line) for line in f if line.strip()]
        return self.spark.createDataFrame(
            [tuple(r[f.name] for f in METRICS_SCHEMA.fields) for r in recs],
            schema=METRICS_SCHEMA,
        )
