"""Batch planning — relational rendering of the reference's bulk batching.

The reference buffers actions and flushes on three triggers: count limit,
byte limit, ticker (bulk.go:206-208,118-122; defaults 1000 / 10 MB / 10 s,
config/config.go:55-66); flushed batches are grouped by cluster key
(bulk.go:373-408) and split into ``concurrentRequest`` chunks
(bulk.go:410-425).

In a batch engine the time trigger is moot, but count/byte batch assignment
is still the unit of sink parallelism and retry. Here it is a window
computation: batch_id = how many limit-crossings precede the row — pure SQL,
auditable, and usable to drive ``repartition`` for sink fan-out (A12/A13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BATCH_SIZE_LIMIT = 1000  # config/config.go:56
DEFAULT_BATCH_BYTE_LIMIT = 10 * 1024 * 1024  # config/config.go:64


def plan_batches(
    actions: DataFrame,
    cluster_col: str = "cluster_key",
    order_col: str = "seq_no",
    size_col: str | None = "byte_size",
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_limit: int = DEFAULT_BATCH_BYTE_LIMIT,
) -> DataFrame:
    """Assign (cluster_key, batch_id) per action.

    batch_id increments when EITHER the running count reaches
    batch_size_limit OR the running byte size reaches batch_byte_limit —
    the same two data-driven flush triggers as the reference. Window is
    per-cluster (the reference keeps one buffer per connector but issues
    per-cluster requests; per-cluster numbering keeps the plan shuffle-free
    after one hash partition on cluster_key).
    """
    w = Window.partitionBy(cluster_col).orderBy(F.col(order_col).asc())
    rn = F.row_number().over(w) - F.lit(1)
    by_count = F.floor(rn / F.lit(batch_size_limit))
    if size_col and size_col in actions.columns:
        run_bytes = F.sum(F.col(size_col)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        by_bytes = F.floor((run_bytes - F.col(size_col)) / F.lit(batch_byte_limit))
        batch_id = F.greatest(by_count, by_bytes)
    else:
        batch_id = by_count
    return actions.withColumn("batch_id", batch_id.cast("long"))


def plan_batches_reset(
    actions: DataFrame,
    cluster_col: str = "cluster_key",
    order_col: str = "seq_no",
    size_col: str | None = "byte_size",
    batch_size_limit: int = DEFAULT_BATCH_SIZE_LIMIT,
    batch_byte_limit: int = DEFAULT_BATCH_BYTE_LIMIT,
) -> DataFrame:
    """Reference-EXACT batch assignment: both accumulators reset at every
    flush (bulk.go:206-208 checks after each append; flushMessages zeroes
    batchSize AND batchByteSize, bulk.go:284-318). ``plan_batches`` keeps
    the cumulative-crossing approximation (identical under count-only
    triggering, shuffle-free); this variant reproduces the Go loop's
    boundaries when byte-triggered early flushes occur.

    Physical shape: one shuffle on the cluster key, then a per-cluster
    greedy segmentation kernel — NOT a per-row Python loop: each batch
    boundary is one ``searchsorted`` against the prefix-sum byte array,
    so the kernel is O(n_batches * log n). The running reset is inherently
    sequential per cluster (it mirrors the reference's single mutexed
    buffer), so one cluster's actions are processed by one task — the
    same per-sink serialization the reference has; fan-out across
    clusters is Spark-parallel.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    has_size = bool(size_col) and size_col in actions.columns
    out_schema = StructType(
        list(actions.schema.fields) + [StructField("batch_id", LongType(), False)]
    )
    L, B = int(batch_size_limit), int(batch_byte_limit)
    sort_cols = [order_col]

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        bids = np.empty(n, dtype=np.int64)
        if has_size:
            prefix = np.cumsum(pdf[size_col].to_numpy(dtype=np.int64))
        else:
            prefix = None
        i, bid, base = 0, 0, 0
        while i < n:
            j = i + L - 1  # count trigger fires ON the Lth appended row
            if prefix is not None:
                j_byte = int(np.searchsorted(prefix, base + B, side="left"))
                j = min(j, j_byte)
            j = min(j, n - 1)
            bids[i : j + 1] = bid
            bid += 1
            if prefix is not None:
                base = int(prefix[j])
            i = j + 1
        pdf["batch_id"] = bids
        return pdf

    return actions.groupBy(cluster_col).applyInPandas(kern, schema=out_schema)


def fan_out(actions: DataFrame, cluster_col: str = "cluster_key", concurrent_requests: int = 1) -> DataFrame:
    """A12+A13: partition by sink cluster, then fixed-width fan-out.

    repartition on (cluster, sub) replaces the errgroup goroutine tree
    (bulk.go:392-424); Spark's scheduler provides the concurrency.
    """
    sub = (F.crc32(F.col("doc_key").cast("string")) % F.lit(concurrent_requests)).alias("_sub")
    return actions.withColumn("_sub", sub).repartition(F.col(cluster_col), F.col("_sub")).drop("_sub")
