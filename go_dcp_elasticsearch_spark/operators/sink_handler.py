"""Sink-response-handler lifecycle + skip filter (SURVEY.md A11/A16, UDF
surface parity).

The reference exposes a 5-method SinkResponseHandler interface
(elasticsearch/sink_response_handler.go:24-30): OnInit / OnSuccess /
OnError / OnBeforeBulk / OnAfterBulk, where OnBeforeBulk may mark batch
items skipped (BatchItem.MarkSkipped, elasticsearch/model.go:13-15,
honored at bulk.go:610-632) and OnError feeds the rejection log.

Batch-engine equivalents:
- on_init        -> job-start hook (driver side)
- on_before_bulk -> a DataFrame -> DataFrame transform that may set an
                    ``is_skipped`` column; skipped rows are filtered out
                    before the sink write (A11)
- on_success/on_error -> per-row routing AFTER the write attempt: the
                    handler receives the success and failure splits;
                    failures append to the RejectionLog and count into
                    MetricsLog (A16/A17)
- on_after_bulk  -> post-write hook with the written count
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.plans.metrics import MetricsLog
from go_dcp_elasticsearch_spark.plans.rejects import RejectionLog


@dataclass
class SinkHandler:
    """Default handler: pass-through before-hook, rejects + counters after."""

    rejects: RejectionLog | None = None
    metrics: MetricsLog | None = None
    calls: list[str] = field(default_factory=list)

    def on_init(self) -> None:
        self.calls.append("init")

    def on_before_bulk(self, actions: DataFrame) -> DataFrame:
        """May add/modify ``is_skipped``; default: keep all."""
        self.calls.append("before")
        return actions

    def on_success(self, succeeded: DataFrame, stage: str) -> None:
        self.calls.append("success")
        if self.metrics is not None:
            self.metrics.record_counts(
                succeeded.withColumn("result", F.lit("success")), stage=stage
            )

    def on_error(self, failed: DataFrame, stage: str) -> None:
        self.calls.append("error")
        if self.rejects is not None:
            self.rejects.append(failed)
        if self.metrics is not None:
            self.metrics.record_counts(
                failed.withColumn("result", F.lit("error")), stage=stage
            )

    def on_after_bulk(self, n_written: int) -> None:
        self.calls.append("after")


def reconcile_sink(
    spark,
    attempted: DataFrame,
    sink_dir: str,
    key_cols: list[str],
    run_id: str | None = None,
) -> DataFrame:
    """A15: attempted-vs-committed reconciliation — the batch analogue of
    the reference parsing the bulk response and joining ``items[idx]`` back
    to ``batchActions[idx]`` (bulk.go:431-497). Returns the attempted rows
    whose keys are NOT present in the sink (a left-anti join against the
    committed table), i.e. the per-item failures of a partial write.

    ``run_id``: scope the committed side to ONE write (the ``_run_id``
    stamped by :func:`run_sink`). Without it, a key committed by any
    EARLIER run to an append-mode sink satisfies the anti-join and a lost
    re-write of that key goes undetected — the normal CDC update case
    would make the check vacuous.

    Scale shape: the committed side is partition-pruned to the run and
    column-pruned to the key columns before the anti-join; no full payload
    re-read."""
    committed = spark.read.parquet(sink_dir)
    if run_id is not None:
        committed = committed.filter(F.col("_run_id") == run_id)
    return attempted.join(committed.select(*key_cols), list(key_cols), "left_anti")


def _guard_unpartitioned_sink(spark, sink_dir: str) -> None:
    """Refuse to append a ``_run_id``-partitioned write into a sink that
    already holds UNPARTITIONED parquet files at its root: Spark's
    partition discovery silently ignores root-level leaf files next to
    partition directories, so every legacy row would vanish from reads.
    Raise with a migration hint instead of corrupting the table."""
    from go_dcp_elasticsearch_spark.fsutil import list_root_files

    for name in list_root_files(spark, sink_dir):
        if name.endswith(".parquet"):
            raise ValueError(
                f"sink {sink_dir} holds unpartitioned parquet written by a "
                "pre-run_id version; appending a _run_id-partitioned write "
                "would make Spark silently drop the legacy rows. Migrate "
                "first (read the sink, add a _run_id column, rewrite "
                "partitionBy('_run_id')) or use a fresh sink directory."
            )


def run_sink(
    actions: DataFrame,
    sink_dir: str,
    handler: SinkHandler | None = None,
    stage: str = "sink",
    error_col: str = "error",
    verify_keys: list[str] | None = None,
    run_id: str | None = None,
) -> dict:
    """Write an actions DataFrame through the full handler lifecycle.

    Rows with a non-null ``error`` column are the failure split (the batch
    engine's analogue of per-item bulk response errors, bulk.go:431-497 —
    errors here surface as data-quality rejections computed upstream,
    e.g. unmappable collections or invalid docs). Rows flagged
    ``is_skipped`` by on_before_bulk are dropped pre-flight (A11).

    Every write is stamped with a ``_run_id`` (a fresh uuid unless given)
    and the sink is PARTITIONED by it, so reconciliation and replay
    inspection read only the current run's files (partition pruning), and
    a key committed by an earlier run can never mask this run's lost write.

    ``verify_keys``: when set, an attempted-vs-committed reconciliation
    (``reconcile_sink`` scoped to this run) runs after the write; any
    attempted key missing from the sink is routed to ``handler.on_error``
    exactly like a per-item bulk rejection. Adds one pruned read of the
    current run's sink partition.
    """
    import uuid

    handler = handler or SinkHandler()
    handler.on_init()
    t0 = time.time()
    if run_id is None:
        run_id = uuid.uuid4().hex
    _guard_unpartitioned_sink(actions.sparkSession, sink_dir)
    staged = handler.on_before_bulk(actions)
    if "is_skipped" in staged.columns:
        staged = staged.filter(~F.coalesce(F.col("is_skipped"), F.lit(False)))
    has_err = error_col in staged.columns
    err_pred = F.col(error_col).isNotNull() if has_err else F.lit(False)
    ok = (
        staged.filter(~err_pred)
        .drop(*([error_col] if has_err else []))
        .withColumn("_run_id", F.lit(run_id))
        .persist()  # two consumers (write + count): don't re-evaluate the plan
    )
    ok.write.mode("append").partitionBy("_run_id").parquet(sink_dir)
    n_written = ok.count()
    n_uncommitted = 0
    if verify_keys:
        uncommitted = reconcile_sink(
            ok.sparkSession, ok, sink_dir, verify_keys, run_id=run_id
        )
        n_uncommitted = uncommitted.count()
        if n_uncommitted:
            handler.on_error(
                uncommitted.withColumn(error_col, F.lit("uncommitted")), stage
            )
            n_written -= n_uncommitted
    handler.on_success(ok, stage)
    if has_err:
        failed = staged.filter(err_pred)
        if not failed.isEmpty():
            handler.on_error(failed, stage)
    handler.on_after_bulk(n_written)
    ok.unpersist()
    latency = (time.time() - t0) * 1000.0
    if handler.metrics is not None:
        handler.metrics.record(stage, "_all", "bulk", "latency", n_written, latency)
    return {
        "written": n_written,
        "uncommitted": n_uncommitted,
        "run_id": run_id,
        "latency_ms": latency,
    }
