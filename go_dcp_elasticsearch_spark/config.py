"""Engine configuration (SURVEY.md A20).

Parity with the reference's config pipeline: YAML -> struct with ${ENV}
interpolation (connector.go:120-144), defaults (batchSizeLimit 1000,
ticker 10 s, byte limit 10 MB, concurrentRequest 1, maxRetries effectively
infinite; config/config.go:54-78), and cluster-key normalization where the
literal key "default" aliases the primary cluster and duplicates are
rejected (config/config.go:14-20, bulk.go:160-166).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

DEFAULT_CLUSTER = ""  # the reference's primary cluster key (config.go:14)


@dataclass
class IndexConfig:
    index_dir: str = "/tmp/ft_index"
    n_shards: int = 8
    n_salts: int = 8
    block_size: int = 128
    batch_size_limit: int = 1000
    batch_byte_limit: int = 10 * 1024 * 1024
    concurrent_requests: int = 1
    max_retries: int | None = None  # None = engine default (task retries)
    collection_index_mapping: dict[str, str] = field(default_factory=dict)
    clusters: dict[str, dict] = field(default_factory=dict)
    rejection_log_include_source: bool = False


def engine_conf(cfg: IndexConfig) -> dict[str, str]:
    """Map engine config onto Spark conf (A14 bounded retry).

    The reference's ``maxRetries`` bounds bulk-request retries
    (config/config.go:76-78, default effectively infinite); the batch
    analogue is the task-attempt budget: a failed sink/stage task is
    re-attempted ``max_retries`` times before the job aborts
    (spark.task.maxFailures = retries + 1). None keeps Spark's default.
    Feed the result into ``get_spark(extra_conf=...)``."""
    out: dict[str, str] = {}
    if cfg.max_retries is not None:
        out["spark.task.maxFailures"] = str(max(1, int(cfg.max_retries) + 1))
    return out


_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def interpolate_env(text: str) -> str:
    """${ENV} substitution (reference: connector.go:129-142)."""
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), ""), text)


def normalize_cluster_keys(clusters: dict[str, dict]) -> dict[str, dict]:
    """'default' aliases the primary cluster key ''; duplicates rejected
    (config/config.go:14-20)."""
    out: dict[str, dict] = {}
    for k, v in clusters.items():
        nk = DEFAULT_CLUSTER if k == "default" else k
        if nk in out:
            raise ValueError(f"duplicate cluster key after normalization: {k!r}")
        out[nk] = v
    return out


def load_config(path_or_dict: str | dict) -> IndexConfig:
    """Load from a YAML path (with env interpolation) or a plain dict —
    the same coercion ladder as newConnectorConfig (connector.go:146-157)."""
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        with open(path_or_dict) as f:
            text = interpolate_env(f.read())
        try:
            import yaml  # optional; baked Spark images carry it

            raw = yaml.safe_load(text) or {}
        except ImportError:
            import json

            raw = json.loads(text)
    known = {f_.name for f_ in IndexConfig.__dataclass_fields__.values()}
    cfg = IndexConfig(**{k: v for k, v in raw.items() if k in known})
    cfg.clusters = normalize_cluster_keys(cfg.clusters or {})
    return cfg
