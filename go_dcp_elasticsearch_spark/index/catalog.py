"""Multi-index / multi-cluster namespace (SURVEY.md B11).

The reference serves multiple named Elasticsearch clusters from one
connector (Clusters map, config/config.go:40; one client per cluster,
connector.go:257-276) and routes actions by ClusterKey + IndexName.
Natively: a catalog directory holds one index dataset per
(cluster_key, index_name); routing an action DataFrame is a partitioned
write; queries address an index by name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from go_dcp_elasticsearch_spark.config import DEFAULT_CLUSTER, normalize_cluster_keys
from go_dcp_elasticsearch_spark.index.builder import IndexBuilder
from go_dcp_elasticsearch_spark.index.query import BM25Query


class IndexCatalog:
    def __init__(self, spark: SparkSession, root: str, clusters: dict[str, dict] | None = None):
        self.spark = spark
        self.root = root.rstrip("/")
        self.clusters = normalize_cluster_keys(clusters or {DEFAULT_CLUSTER: {}})

    def _dir(self, index_name: str, cluster_key: str = DEFAULT_CLUSTER) -> str:
        if cluster_key not in self.clusters:
            raise KeyError(f"unknown cluster key: {cluster_key!r}")  # bulk.go:160-166
        ck = cluster_key or "_default"
        return f"{self.root}/{ck}/{index_name}"

    def builder(self, index_name: str, cluster_key: str = DEFAULT_CLUSTER, **kw) -> IndexBuilder:
        return IndexBuilder(
            self.spark, self._dir(index_name, cluster_key), index_name=index_name, **kw
        )

    def query(self, index_name: str, cluster_key: str = DEFAULT_CLUSTER) -> BM25Query:
        return BM25Query(self.spark, self._dir(index_name, cluster_key))

    def list_indexes(self) -> list[tuple[str, str]]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for ck in sorted(os.listdir(self.root)):
            ck_dir = f"{self.root}/{ck}"
            if os.path.isdir(ck_dir):
                for idx in sorted(os.listdir(ck_dir)):
                    if os.path.isdir(f"{ck_dir}/{idx}"):
                        out.append((DEFAULT_CLUSTER if ck == "_default" else ck, idx))
        return out

    def route_actions(self, actions: DataFrame) -> dict[tuple[str, str], DataFrame]:
        """Split an actions DataFrame by (cluster_key, index_name) — the
        relational analogue of bulkRequest's per-cluster grouping
        (bulk.go:373-408). Returns one DataFrame per target."""
        from pyspark.sql import functions as F

        targets = [
            (r["cluster_key"], r["index_name"])
            for r in actions.select("cluster_key", "index_name").distinct().collect()
        ]
        return {
            (ck, idx): actions.filter(
                (F.col("cluster_key") == ck) & (F.col("index_name") == idx)
            )
            for ck, idx in targets
        }
