"""PySpark-native fulltext indexing + BM25 query engine.

A from-scratch rebuild of the capabilities of Trendyol/go-dcp-elasticsearch
(reference at /root/reference, cited per-module as file:line): the reference
is a Couchbase-DCP -> Elasticsearch bulk-indexing pipeline; this package keeps
its pipeline semantics (mapping, batching, last-write-wins dedup, routing,
multi-sink partitioning, retry, rejection log, checkpointed resumability,
metrics) and *internalizes the sink*: a Spark-distributed inverted-index
builder and BM25 top-k retrieval engine over a corpus table of source-code
files ``(repo, path, commit, lang, content)``.

Design stance (idiomatic Spark, not a port):
- DataFrame/SQL first; Catalyst plans everything declarative.
- All per-row compute in vectorized Arrow/pandas UDFs (no per-row Python).
- Streaming concerns of the reference (ack, checkpoint, rebalance,
  dead-letter) become a lineage-table protocol + deterministic partition
  overwrites (see ``plans/``).
"""

__version__ = "0.1.0"

from go_dcp_elasticsearch_spark.session import get_spark  # noqa: F401
