"""Structured Streaming ingestion (the DCP-stream role)."""

from go_dcp_elasticsearch_spark.streaming.pipeline import (  # noqa: F401
    stream_changes,
    stream_changes_to_index,
    write_corpus_mirror,
)
