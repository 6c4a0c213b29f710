"""Pipeline-state protocol: lineage checkpoints, metrics, rejection log."""

from go_dcp_elasticsearch_spark.plans.lineage import LineageLog  # noqa: F401
from go_dcp_elasticsearch_spark.plans.metrics import MetricsLog  # noqa: F401
from go_dcp_elasticsearch_spark.plans.rejects import RejectionLog  # noqa: F401
