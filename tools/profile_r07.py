"""Round-7 profiling harness: reproduce individual bench pieces with
phase traces so optimization targets can be localized without running the
whole frozen bench.py.

Usage:
  PYTHONPATH=/root/repo SPARK_GRAFT_TRACE=1 python tools/profile_r07.py <piece> [args]

Pieces:
  build_sf        sf0.1 corpus build (bench build_sec)
  build_synth N   synthetic build of N docs (bench build_synth20k / big_build)
  delta_big N     1M-doc index + scattered delta apply + multiseg applies
  refresh_big N   refresh cost on the big index with segments pending
  ops             operator-suite timings (minhash/ngram/dedup_clusters)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _spark():
    from go_dcp_elasticsearch_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_r07", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"PROF {label}: {time.time() - t0:.3f}s", flush=True)
    return out


def build_sf():
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    corpus = load_documents_corpus(spark, sf_dir)
    for rep in range(2):
        idx = tempfile.mkdtemp(prefix="prof_idx_")
        try:
            t(f"build_sf[{rep}]", lambda: IndexBuilder(
                spark, idx, n_shards=32
            ).build(corpus))
            t(f"bm25query_init[{rep}]", lambda: BM25Query(spark, idx))
        finally:
            shutil.rmtree(idx, ignore_errors=True)


def build_synth(n):
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import IndexBuilder

    spark = _spark()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    big_dir = tempfile.mkdtemp(prefix="prof_big_")
    try:
        corpus_path = f"{big_dir}/corpus"
        t("synth_write", lambda: synth_corpus(
            spark, n, n_partitions=cpus * 2
        ).write.parquet(corpus_path))
        big_corpus = spark.read.parquet(corpus_path)
        t("build", lambda: IndexBuilder(
            spark, f"{big_dir}/idx", n_shards=cpus, id_mode="input"
        ).build(big_corpus))
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


def _mk_big(spark, n, big_dir):
    from go_dcp_elasticsearch_spark.corpus import synth_corpus
    from go_dcp_elasticsearch_spark.index import IndexBuilder

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_path = f"{big_dir}/corpus"
    synth_corpus(spark, n, n_partitions=cpus * 2).write.parquet(corpus_path)
    big_corpus = spark.read.parquet(corpus_path)
    t("big_build", lambda: IndexBuilder(
        spark, f"{big_dir}/idx", n_shards=cpus, id_mode="input"
    ).build(big_corpus))
    return big_corpus


def delta_big(n):
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.index import BM25Query
    from go_dcp_elasticsearch_spark.index.segments import fold_segments
    from go_dcp_elasticsearch_spark.sources.changes import (
        apply_changes_to_index,
    )

    spark = _spark()
    big_dir = tempfile.mkdtemp(prefix="prof_big_")
    try:
        big_corpus = _mk_big(spark, n, big_dir)
        idx = f"{big_dir}/idx"

        # clustered rebuild apply (bench big_incremental_apply)
        lo = n // 2
        upd = big_corpus.filter(
            (F.col("seq_no") >= lo) & (F.col("seq_no") < lo + max(n // 1000, 1))
        ).withColumn("content", F.concat(F.col("content"), F.lit(" bigPatchToken")))
        new_big = big_corpus.join(
            upd.select("repo", "path"), ["repo", "path"], "left_anti"
        ).unionByName(upd)
        ch = upd.select(
            "repo", "path", F.lit("index").alias("action"),
            (F.col("seq_no") + F.lit(10_000_000)).cast("long").alias("seq_no"),
        )
        t("rebuild_apply", lambda: apply_changes_to_index(
            spark, idx, new_big, ch
        ))

        # scattered delta apply (bench big_inc_scattered_delta)
        upd_sc = big_corpus.filter(F.col("seq_no") % (n // 1000) == 7).withColumn(
            "content", F.concat(F.col("content"), F.lit(" scatterPatchToken"))
        )
        new_sc = new_big.join(
            upd_sc.select("repo", "path"), ["repo", "path"], "left_anti"
        ).unionByName(upd_sc)
        ch_sc = upd_sc.select(
            "repo", "path", F.lit("index").alias("action"),
            (F.col("seq_no") + F.lit(20_000_000)).cast("long").alias("seq_no"),
        )
        t("scattered_delta", lambda: apply_changes_to_index(
            spark, idx, new_sc, ch_sc, strategy="delta"
        ))

        qb = BM25Query(spark, idx)
        t("refresh_postdelta", lambda: qb.refresh())

        t("fold_1seg", lambda: fold_segments(spark, idx))

        # multiseg: 6 small delta applies (bench big_multiseg_applies)
        state = new_sc
        for j in range(6):
            cond = (F.col("seq_no") >= j * 1000) & (F.col("seq_no") < j * 1000 + 100)
            state = state.withColumn(
                "content",
                F.when(cond, F.concat(F.col("content"), F.lit(f" msegTok{j}")))
                .otherwise(F.col("content")),
            )
            ch_ms = state.filter(cond).select(
                "repo", "path", F.lit("index").alias("action"),
                (F.col("seq_no") + F.lit(30_000_000 + j * 1_000_000))
                .cast("long").alias("seq_no"),
            )
            t(f"mseg_apply[{j}]", lambda: apply_changes_to_index(
                spark, idx, state, ch_ms, strategy="delta"
            ))
        t("refresh_multiseg", lambda: qb.refresh())
        t("fold_multiseg", lambda: fold_segments(spark, idx))
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)


def ops():
    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ["minhash_lsh_pairs", "ngram_jaccard", "dedup_clusters",
                 "bm25_topk", "quality_score", "language_id", "exact_dedup",
                 "embedding_topk"]:
        for rep in range(2):
            t(f"{name}[{rep}]", lambda: qs[name](spark, sf_dir).collect())

    from go_dcp_elasticsearch_spark.operators.dedup import minhash_lsh_pairs

    docs_tbl = load_documents_corpus(spark, sf_dir).withColumnRenamed(
        "content", "text"
    ).withColumn("doc_id", F.col("seq_no").cast("long"))
    t("minhash_scale_mode", lambda: minhash_lsh_pairs(
        docs_tbl, "text", "doc_id", n_hashes=6, scale_mode=True
    ).count())


if __name__ == "__main__":
    piece = sys.argv[1]
    if piece == "build_sf":
        build_sf()
    elif piece == "build_synth":
        build_synth(int(sys.argv[2]))
    elif piece == "delta_big":
        delta_big(int(sys.argv[2]))
    elif piece == "ops":
        ops()
    else:
        raise SystemExit(f"unknown piece {piece}")
