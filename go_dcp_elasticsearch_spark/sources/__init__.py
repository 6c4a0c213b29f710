"""Sources: corpus loaders and the CDC-style change feed."""

from go_dcp_elasticsearch_spark.sources.changes import (  # noqa: F401
    apply_changes,
    apply_changes_to_index,
    compact_index,
    incremental_index_delta,
)
from go_dcp_elasticsearch_spark.sources.snapshots import (  # noqa: F401
    SnapshotStore,
    applied_snapshot_id,
    resume_apply,
)
