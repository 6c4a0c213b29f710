"""SPIMI-style distributed inverted-index builder (SURVEY.md B6-B8).

Replaces the sink side of the reference pipeline: where go-dcp-elasticsearch
renders NDJSON bulk bodies and POSTs them to Elasticsearch which builds the
Lucene index (elasticsearch/bulk/bulk.go:284-318), we build the index
ourselves as columnar Parquet tables.

Pipeline (one tokenize pass; every stage a DataFrame op or Arrow UDF):

  corpus (repo, path, commit, lang, content, seq_no)
    -> last-write-wins dedup per (repo, path)        [A7, bulk.go:179-195]
    -> deterministic dense doc_id                     (range-sorted + offsets;
       no single-partition global window — scales to 10^12 rows)
    -> mapInPandas tokenize+TF                        [B6; map-side partial agg
       = SPIMI per-partition in-memory posting build]
    -> stats (n_docs, avgdl)                          [B9 inputs]
    -> per-(term, shard) group -> sorted, delta-gap + varbyte blocks with
       block-max metadata                             [B7+B8]
    -> dictionary via SALTED two-phase agg            [hot-term skew,
       north_rule; A12/A13 analogue of per-cluster fan-out]
    -> docs forward store with content_sha256         [per-row invariant]
    -> lineage + metrics rows                         [A17/A18]

Sharding: postings are partitioned by shard = doc_id % n_shards. A hot term's
posting list is therefore split across all shards (bounded reducer keys —
the build-side skew answer), and queries run shard-parallel with a cheap
global top-k merge (the ES shard model the reference relies on implicitly).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from go_dcp_elasticsearch_spark.functions.bm25 import B, K1
from go_dcp_elasticsearch_spark.functions.codec import encode_postings
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.plans.lineage import LineageLog
from go_dcp_elasticsearch_spark.plans.metrics import MetricsLog

TF_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), False),
        StructField("tf", LongType(), False),
        StructField("dl", LongType(), False),
        StructField("shard", IntegerType(), False),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("block_id", IntegerType(), False),
        StructField("ids_vb", BinaryType(), False),
        StructField("tfs_vb", BinaryType(), False),
        StructField("dls_vb", BinaryType(), False),
        StructField("count", IntegerType(), False),
        StructField("max_doc_id", LongType(), False),
        StructField("max_tf", LongType(), False),
        StructField("block_max_tf_norm", DoubleType(), False),
    ]
)


@dataclass
class IndexPaths:
    root: str

    @property
    def docs(self) -> str:
        return f"{self.root}/docs"

    @property
    def postings(self) -> str:
        return f"{self.root}/postings"

    @property
    def dictionary(self) -> str:
        return f"{self.root}/dictionary"

    @property
    def stats(self) -> str:
        return f"{self.root}/stats"

    @property
    def lineage(self) -> str:
        return f"{self.root}/_lineage"

    @property
    def metrics(self) -> str:
        return f"{self.root}/_metrics"

    @property
    def rejects(self) -> str:
        return f"{self.root}/_rejects"


def assign_doc_ids(corpus: DataFrame, n_range_parts: int = 32) -> DataFrame:
    """Deterministic dense doc_id = rank of (repo, path) in global sort order.

    Scalable variant of ``row_number() OVER (ORDER BY repo, path)``: a global
    window would funnel 10^12 rows through ONE partition. Instead:
    range-partition on the key, sort within partitions, count rows per
    partition (tiny agg), broadcast cumulative offsets, add local index.
    Same semantics, no single-reducer stage.
    """
    keyed = corpus.repartitionByRange(n_range_parts, "repo", "path").sortWithinPartitions(
        "repo", "path"
    )
    keyed = keyed.withColumn("_pid", F.spark_partition_id())
    # tiny: n_range_parts rows to the driver
    counts = {
        r["_pid"]: r["c"]
        for r in keyed.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(corpus.schema.fields + [StructField("doc_id", LongType(), False)])

    def add_ids(iterator):
        base = None
        seen = 0
        for pdf in iterator:
            if base is None:
                base = offsets[int(pdf["_pid"].iloc[0])] if len(pdf) else 0
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    return keyed.mapInPandas(add_ids, schema=out_schema)


def dedup_last_write_wins(corpus: DataFrame) -> DataFrame:
    """A7: one action per key, newest wins (bulk.go:179-195,596-608).

    The reference replaces an earlier batch entry in place when the same
    action key re-arrives; relationally that is row_number()=1 over the key
    ordered by the ordering authority (seq_no) descending.
    """
    w = Window.partitionBy("repo", "path").orderBy(F.col("seq_no").desc())
    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


class IndexBuilder:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        n_shards: int = 8,
        n_salts: int = 8,
        salt_df_threshold: int = 10_000,
        index_name: str = "default",
    ):
        self.spark = spark
        self.paths = IndexPaths(index_dir)
        self.n_shards = n_shards
        self.n_salts = n_salts
        self.salt_df_threshold = salt_df_threshold
        self.index_name = index_name
        self.lineage = LineageLog(spark, self.paths.lineage)
        self.metrics = MetricsLog(spark, self.paths.metrics)

    # ---- stage kernels ----

    def _tf_rows(self, corpus_ids: DataFrame) -> DataFrame:
        """Tokenize + per-doc TF in one Arrow pass (SPIMI map side).

        Emitting (term, doc_id, tf, dl) instead of exploded positions is the
        map-side combine: shuffle volume is distinct-terms-per-doc, not
        token count.
        """
        n_shards = self.n_shards

        def kernel(iterator):
            from collections import Counter

            for pdf in iterator:
                terms, dids, tfs, dls, shards = [], [], [], [], []
                for did, content in zip(pdf["doc_id"], pdf["content"]):
                    toks = tokenize_py(content)
                    c = Counter(toks)
                    dl = len(toks)
                    sh = int(did) % n_shards
                    for t, tf in c.items():
                        terms.append(t)
                        dids.append(int(did))
                        tfs.append(int(tf))
                        dls.append(dl)
                        shards.append(sh)
                yield pd.DataFrame(
                    {"term": terms, "doc_id": dids, "tf": tfs, "dl": dls, "shard": shards}
                )

        return corpus_ids.select("doc_id", "content").mapInPandas(kernel, schema=TF_SCHEMA)

    def _encode_groups(self, avgdl: float):
        """applyInPandas kernel: one (term, shard) group -> compressed block rows."""
        k1, b = K1, B

        def encode(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            pdf = pdf.sort_values("doc_id")
            ids = pdf["doc_id"].to_numpy()
            tfs = pdf["tf"].to_numpy()
            dls = pdf["dl"].to_numpy()
            term = pdf["term"].iloc[0]
            shard = int(pdf["shard"].iloc[0])
            blocks = encode_postings(ids, tfs)
            rows = []
            from go_dcp_elasticsearch_spark.functions.codec import BLOCK_SIZE, varbyte_encode

            for blk in blocks:
                s = blk["block_id"] * BLOCK_SIZE
                e = s + blk["count"]
                dl_slice = dls[s:e].astype(np.uint64)
                tf_slice = tfs[s:e].astype(np.float64)
                tf_norm = tf_slice / (tf_slice + k1 * (1.0 - b + b * dls[s:e] / avgdl))
                rows.append(
                    (
                        term,
                        shard,
                        blk["block_id"],
                        blk["ids_vb"],
                        blk["tfs_vb"],
                        varbyte_encode(dl_slice),
                        blk["count"],
                        blk["max_doc_id"],
                        blk["max_tf"],
                        float(tf_norm.max()),
                    )
                )
            return pd.DataFrame(rows, columns=[f.name for f in POSTINGS_SCHEMA.fields])

        return encode

    def salted_dictionary(self, tf_rows: DataFrame) -> DataFrame:
        """Dictionary (term, df, cf) via explicit salted two-phase aggregation.

        north_rule requires explicit skew handling beyond AQE: hot terms
        (df over the whole corpus can be ~n_docs) would otherwise route one
        reducer key to one task. Phase 1 groups by (term, salt=doc_id %
        n_salts) — partial map-side-combined aggregates; phase 2 merges the
        at-most-n_salts partials per term. Reducer key fan-in is bounded by
        construction, not by runtime luck.
        """
        salted = tf_rows.withColumn(
            "_salt", (F.col("doc_id") % F.lit(self.n_salts)).cast("int")
        )
        partial = salted.groupBy("term", "_salt").agg(
            F.count("*").alias("_df"), F.sum("tf").alias("_cf")
        )
        return partial.groupBy("term").agg(
            F.sum("_df").alias("df"), F.sum("_cf").alias("cf")
        )

    # ---- main entry ----

    def build(self, corpus: DataFrame, resume: bool = False) -> dict:
        """Run the full build. Returns summary dict.

        Stage outputs land as deterministic partition overwrites; a lineage
        row commits after each stage (the analogue of ack-gated manual DCP
        checkpointing, connector.go:186 + bulk.go:320-332). ``resume=True``
        skips stages whose lineage rows exist (idempotent re-run).
        """
        t0 = time.time()
        done = self.lineage.completed_stages() if resume else set()

        deduped = dedup_last_write_wins(corpus)
        corpus_ids = assign_doc_ids(deduped)
        corpus_ids.persist()
        n_docs = corpus_ids.count()

        tf = self._tf_rows(corpus_ids)
        tf.persist()

        # stats first (avgdl feeds block-max metadata)
        if "stats" not in done:
            dl_per_doc = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            stats = dl_per_doc.agg(
                F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
            ).withColumn("index_name", F.lit(self.index_name))
            stats.coalesce(1).write.mode("overwrite").parquet(self.paths.stats)
            self.lineage.commit("stats", 0, n_docs)
        srow = self.spark.read.parquet(self.paths.stats).collect()[0]
        avgdl = float(srow["avgdl"])

        if "docs" not in done:
            dl_df = tf.groupBy("doc_id").agg(F.first("dl").alias("doc_len"))
            docs = (
                corpus_ids.select(
                    "doc_id",
                    "repo",
                    "path",
                    "commit",
                    "lang",
                    F.sha2(F.col("content"), 256).alias("content_sha256"),
                    (F.col("doc_id") % F.lit(self.n_shards)).cast("int").alias("shard"),
                )
                .join(dl_df, "doc_id", "left")
                .na.fill({"doc_len": 0})
            )
            docs.write.mode("overwrite").partitionBy("shard").parquet(self.paths.docs)
            self.lineage.commit("docs", 0, n_docs)

        if "postings" not in done:
            postings = tf.groupBy("term", "shard").applyInPandas(
                self._encode_groups(avgdl), schema=POSTINGS_SCHEMA
            )
            (
                postings.repartition("shard")
                .sortWithinPartitions("term", "block_id")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(self.paths.postings)
            )
            self.lineage.commit("postings", 0, n_docs)

        if "dictionary" not in done:
            dictionary = self.salted_dictionary(tf)
            dictionary.write.mode("overwrite").parquet(self.paths.dictionary)
            self.lineage.commit("dictionary", 0, n_docs)

        elapsed = time.time() - t0
        self.metrics.record(
            stage="build",
            index_name=self.index_name,
            action="index",
            result="success",
            count=n_docs,
            latency_ms=elapsed * 1000.0,
        )
        tf.unpersist()
        corpus_ids.unpersist()
        return {"n_docs": n_docs, "avgdl": avgdl, "elapsed_sec": elapsed}
