"""Metrics log (SURVEY.md A17).

Parity with the reference's per-index {index,delete} x {success,error}
Prometheus counters and latency gauges (elasticsearch/bulk/bulk.go:56-63,
572-594; metric/collector.go:82-101). Counters land as one immutable
metadata file per record through the Hadoop FS API (O(ms), control-plane
facts next to the data on HDFS/S3A — see plans.lineage for the rationale);
``read()`` exposes them as a DataFrame and a dashboard is a groupBy away.
``record_counts`` takes a pre-aggregated DataFrame for distributed counting.
Legacy appended ``metrics.jsonl`` logs are read transparently.
"""

from __future__ import annotations

import datetime
import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from go_dcp_elasticsearch_spark.plans.lineage import METRICS_SCHEMA


class MetricsLog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.legacy_file = f"{self.path}/metrics.jsonl"
        self._tag = uuid.uuid4().hex[:12]
        self._seq = 0

    def record(
        self,
        stage: str,
        index_name: str,
        action: str,
        result: str,
        count: int,
        latency_ms: float = 0.0,
    ) -> None:
        from go_dcp_elasticsearch_spark.fsutil import write_file

        rec = {
            "stage": stage,
            "index_name": index_name,
            "action": action,
            "result": result,
            "count": int(count),
            "latency_ms": float(latency_ms),
            "recorded_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        }
        self._seq += 1
        write_file(
            self.spark,
            f"{self.path}/rec-{self._tag}-{self._seq:06d}.json",
            json.dumps(rec),
        )

    def record_counts(self, df: DataFrame, stage: str, latency_ms: float = 0.0) -> None:
        """Aggregate a (index_name, action, result) DataFrame distributedly,
        then append the (small) grouped counters."""
        rows = df.groupBy("index_name", "action", "result").count().collect()
        for r in rows:
            self.record(stage, r["index_name"], r["action"], r["result"], r["count"], latency_ms)

    def read(self) -> DataFrame:
        from go_dcp_elasticsearch_spark.fsutil import list_root_files, read_file

        recs = []
        names = list_root_files(self.spark, self.path)
        if "metrics.jsonl" in names:  # pre-round-4 appended log
            recs = [
                json.loads(line)
                for line in read_file(self.spark, self.legacy_file).splitlines()
                if line.strip()
            ]
        for name in sorted(n for n in names if n.startswith("rec-") and n.endswith(".json")):
            recs.append(json.loads(read_file(self.spark, f"{self.path}/{name}")))
        return self.spark.createDataFrame(
            [tuple(r[f.name] for f in METRICS_SCHEMA.fields) for r in recs],
            schema=METRICS_SCHEMA,
        )
