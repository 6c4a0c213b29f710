"""Inverted-index build + BM25 query engine (the internalized 'sink')."""

from go_dcp_elasticsearch_spark.index.builder import IndexBuilder  # noqa: F401
from go_dcp_elasticsearch_spark.index.query import BM25Query  # noqa: F401
from go_dcp_elasticsearch_spark.index.verify import (  # noqa: F401
    verify_index_against_source,
)
