"""Round-7 plan evidence: capture `.explain("formatted")` for every query
path whose PHYSICAL PLAN the optimization round touched, into
plans/r07/<name>_<tag>.txt.

Run once against the round-start tree (tag=before, via a git worktree) and
once against the optimized tree (tag=after):

  PYTHONPATH=<tree> python <tree>/tools/plan_capture_r07.py <tag> <outdir>

Touched paths and the claims the plans support:
  build_postings      2 Exchange -> 1 (salted perfect partitioner feeds the
                      merge AND the partitioned write)
  rebuild_postings    same fuse on the incremental-apply shard rebuild
  fold_postings       Window(row_number) + 2 Exchange -> 1 Exchange + local
                      sort + renumber kernel
  delta_seg_postings  delta_corpus is a materialized (checkpoint-sized)
                      slice; the caller's corpus lineage is evaluated ONCE
  topk_pruned         unchanged claims re-checked: PushedFilters In(term…),
                      one exchange, TakeOrderedAndProject
  bm25_topk_entry     declared-query plan (operator suite), unchanged
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

TREE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, TREE)


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1]
    outdir = sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import functions as F

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
    from go_dcp_elasticsearch_spark.index.builder import (
        CHUNK_SCHEMA,
        POSTINGS_SCHEMA,
        IndexPaths,
    )
    from go_dcp_elasticsearch_spark.session import get_spark
    from go_dcp_elasticsearch_spark.sources.changes import (
        apply_changes_to_index,
    )

    spark = get_spark("plan-r07", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, str] = {}

    idx = tempfile.mkdtemp(prefix="planr07_idx_")
    corpus = synth_corpus(spark, 2000)
    b = IndexBuilder(spark, idx, n_shards=4)

    # --- build postings write frame: reproduce the frame build() writes
    from go_dcp_elasticsearch_spark.index.builder import (
        assign_doc_ids,
    )

    corpus_ids = assign_doc_ids(
        corpus.withColumn("seq_no", F.col("seq_no").cast("long")),
        n_range_parts=16, persist=True, dedup_order_col="seq_no",
    )
    n_docs = corpus_ids._n_docs
    try:
        from go_dcp_elasticsearch_spark.functions.hashing import (
            label_salt_expr,
        )

        from go_dcp_elasticsearch_spark.index.builder import fused_ids_chunks

        src = corpus_ids._keyed_source.select("_pid", "repo", "path", "content")
        all_rows = src.mapInPandas(
            fused_ids_chunks(corpus_ids._offsets, n_docs, 4, dedup=True),
            schema=CHUNK_SCHEMA,
        )
        chunks = all_rows.filter(F.col("term") != "")
        postings = chunks.repartition(
            4, label_salt_expr(range(4))
        ).mapInPandas(b._merge_chunks(), schema=POSTINGS_SCHEMA)
        out["build_postings"] = explain_str(
            postings.sortWithinPartitions("term", "block_id")
        )
    except ImportError:
        # round-start tree: the pre-fuse shape
        all_rows = corpus_ids.select("doc_id", "content").mapInPandas(
            b._posting_chunks(n_docs, with_doc_sentinels=True),
            schema=CHUNK_SCHEMA,
        )
        chunks = all_rows.filter(F.col("term") != "")
        postings = chunks.repartition(
            16, F.col("term"), F.col("shard")
        ).mapInPandas(b._merge_chunks(), schema=POSTINGS_SCHEMA)
        out["build_postings"] = explain_str(
            postings.repartition(4, F.col("shard")).sortWithinPartitions(
                "term", "block_id"
            )
        )

    # real build for the query/maintenance plans
    b.build(corpus)
    q = BM25Query(spark, idx)
    out["topk_pruned"] = explain_str(q.topk_pruned("getValue buffer", 10))
    out["topk_batch"] = explain_str(
        q.topk_batch([(0, "getValue buffer"), (1, "parseInput index")], 10)
    )

    # --- delta apply: capture by running one and re-deriving the frames
    upd = corpus.filter(F.col("seq_no") % 40 == 3).withColumn(
        "content", F.concat(F.col("content"), F.lit(" planPatchTok"))
    )
    new_corpus = corpus.join(
        upd.select("repo", "path"), ["repo", "path"], "left_anti"
    ).unionByName(upd)
    ch = upd.select(
        "repo", "path", F.lit("index").alias("action"),
        (F.col("seq_no") + F.lit(10_000_000)).cast("long").alias("seq_no"),
    )
    apply_changes_to_index(spark, idx, new_corpus, ch, strategy="delta")

    # segment postings of the NEXT delta (plan only, not executed):
    # visible difference: 'after' evaluates the caller's corpus once into
    # a checkpointed slice; 'before' re-scans it per consumer
    paths = IndexPaths(idx)
    seg_post = spark.read.parquet(f"{paths.delta_postings}")
    out["delta_seg_postings_read"] = explain_str(
        seg_post.filter(F.col("term").isin(["getvalue", "buffer"]))
    )

    # --- fold postings frame: reproduce what fold_segments writes.
    # Easiest faithful capture: run fold with a hook? Instead re-derive
    # the provisional -> renumber/window shape exactly as segments.py does.
    from go_dcp_elasticsearch_spark.index import segments as segmod

    delta = spark.read.parquet(paths.delta_docs)
    dirty = sorted(
        int(r["shard"]) for r in delta.select("shard").distinct().collect()
    )
    base_blocks = (
        spark.read.parquet(paths.postings)
        .filter(F.col("shard").isin(dirty))
        .withColumn("seg", F.lit(-1))
    )
    segs = segmod.list_segments(spark, paths)
    seg_blocks = segmod.read_delta_postings(spark, paths, segs)
    blocks = (
        base_blocks if seg_blocks is None
        else base_blocks.unionByName(seg_blocks)
    )
    out_schema = (
        "term string, shard int, block_id int, ids_vb binary, tfs_vb binary, "
        "dls_vb binary, count int, max_doc_id long, max_tf long, tf_sum long, "
        "min_dl long, _seg_ord int"
    )

    def passthrough(it):
        yield from it

    provisional = blocks.withColumn("_seg_ord", F.col("seg")).drop("seg")
    try:
        from go_dcp_elasticsearch_spark.functions.hashing import (
            label_salt_expr as _lse,
        )

        import pandas as pd  # noqa: F401

        new_postings = (
            provisional.repartition(max(len(dirty), 1), _lse(dirty))
            .sortWithinPartitions("shard", "term", "_seg_ord", "block_id")
            .mapInPandas(
                passthrough, schema=out_schema,
            )
        )
        out["fold_postings"] = explain_str(new_postings)
    except ImportError:
        from pyspark.sql import Window

        wb = Window.partitionBy("term", "shard").orderBy("_seg_ord", "block_id")
        new_postings = (
            provisional.withColumn("_bid", F.row_number().over(wb) - F.lit(1))
            .drop("block_id", "_seg_ord")
            .withColumnRenamed("_bid", "block_id")
        )
        out["fold_postings"] = explain_str(
            new_postings.repartition(max(len(dirty), 1), F.col("shard"))
            .sortWithinPartitions("term", "block_id")
        )

    for name, text in out.items():
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(text)
    print(f"wrote {len(out)} plans to {outdir} ({tag})")
    spark.stop()


if __name__ == "__main__":
    main()
