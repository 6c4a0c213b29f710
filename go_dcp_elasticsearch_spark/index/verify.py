"""Per-row source-parity verification (north-star invariant: content
sha256 equality is enforced per row against the source).

The reference trusts Elasticsearch's `_source` round-trip; our postings
are DERIVED data, so the docs forward store carries sha256(content) from
build time and this module proves, row by row, that the index still
describes exactly the source table: no missing keys, no extra keys, no
content drift.

Scale shape: the source's sha is computed MAP-SIDE before the join, so
content bytes never shuffle — the join moves (key, 64-char hex) only;
violations are classified in one pass (a single full-outer join + one
aggregation); with `return_violations` the violation rows are returned
as a DataFrame (suitable for the rejection dead-letter sink, A16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def verify_index_against_source(
    spark: SparkSession,
    index_dir: str,
    source: DataFrame,
    key_cols: list[str] = ("repo", "path"),
    content_col: str = "content",
    return_violations: bool = False,
) -> dict:
    """Compare the index's docs table against the source corpus.

    Returns {"n_docs", "n_source", "missing_in_index", "extra_in_index",
    "sha_mismatch", "n_ok"} and, with ``return_violations``, a
    "violations" DataFrame of (key_cols..., kind) rows.
    """
    key_cols = list(key_cols)
    # explicit presence markers, NOT sha nullity: a row present on both
    # sides with NULL content (sha2(NULL) = NULL) must compare as ok, not
    # masquerade as missing/extra
    from go_dcp_elasticsearch_spark.index.segments import read_docs

    # LIVE docs view (base + delta segments, tombstones dropped): an
    # index with pending delta applies verifies against the post-change
    # source without requiring a fold first
    docs = read_docs(spark, index_dir).select(
        *key_cols,
        F.col("content_sha256").alias("_idx_sha"),
        F.lit(True).alias("_in_idx"),
    )
    src = source.select(
        *key_cols,
        F.sha2(F.col(content_col), 256).alias("_src_sha"),
        F.lit(True).alias("_in_src"),
    )
    joined = docs.join(src, key_cols, "full_outer")
    kind = (
        F.when(F.col("_in_idx").isNull(), F.lit("missing_in_index"))
        .when(F.col("_in_src").isNull(), F.lit("extra_in_index"))
        .when(
            ~F.col("_idx_sha").eqNullSafe(F.col("_src_sha")), F.lit("sha_mismatch")
        )
        .otherwise(F.lit("ok"))
    )
    classified = joined.select(*key_cols, kind.alias("kind"))
    counts = {
        r["kind"]: int(r["c"])
        for r in classified.groupBy("kind").agg(F.count("*").alias("c")).collect()
    }
    out = {
        "n_docs": counts.get("ok", 0) + counts.get("extra_in_index", 0)
        + counts.get("sha_mismatch", 0),
        "n_source": counts.get("ok", 0) + counts.get("missing_in_index", 0)
        + counts.get("sha_mismatch", 0),
        "missing_in_index": counts.get("missing_in_index", 0),
        "extra_in_index": counts.get("extra_in_index", 0),
        "sha_mismatch": counts.get("sha_mismatch", 0),
        "n_ok": counts.get("ok", 0),
    }
    if return_violations:
        out["violations"] = classified.filter(F.col("kind") != "ok")
    return out
