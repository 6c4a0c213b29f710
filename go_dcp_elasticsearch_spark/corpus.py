"""Corpus inputs.

Two sources, per FIXTURES.md:
1. ``synth_corpus`` — deterministic synthetic source-code corpus with the
   exact input_hint shape ``(repo, path, commit, lang, content)``; Zipf-ish
   repo sizes exercise skew; planted hot + rare terms make BM25 ranks
   non-trivial and stable. Stand-in for the 10^12-file Iceberg table.
2. ``load_documents_corpus`` — thin column-mapping shim over the driver's
   ``documents.parquet`` (text -> content), used for oracle-checked queries.

The reference's source is the Couchbase travel-sample bucket streamed over
DCP (test/couchbase/configure.sh:36); the corpus table plays that role.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

CORPUS_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
        StructField("seq_no", IntegerType(), False),
    ]
)

_LANGS = ["python", "go", "java", "js", "c"]
_EXT = {"python": "py", "go": "go", "java": "java", "js": "js", "c": "c"}
_KEYWORDS = {
    "python": ["def", "class", "import", "return", "yield", "lambda"],
    "go": ["func", "package", "import", "return", "defer", "chan"],
    "java": ["public", "class", "static", "void", "return", "extends"],
    "js": ["function", "const", "let", "return", "async", "await"],
    "c": ["int", "void", "struct", "return", "static", "sizeof"],
}
# hot terms appear in most docs; rare terms are planted in a small slice so
# BM25 idf separates them sharply (FIXTURES.md §1).
HOT_TERMS = ["getValue", "parseInput", "buffer", "index"]
RARE_TERMS = ["quasarFlux", "zephyrDelta", "obsidian_marker", "kraken_sentinel"]


def _lcg(seed: int) -> int:
    return (seed * 6364136223846793005 + 1442695040888963407) % (1 << 63)


def _gen_row(i: int, n_rows: int) -> tuple[str, str, str, str, str, int]:
    """Deterministic row i of the synthetic corpus (pure function of i)."""
    s = _lcg(i + 42)
    repo = f"org{i % 7}/repo{s % 101}"  # Zipf-ish: repo index reused often
    lang = _LANGS[(s >> 8) % len(_LANGS)]
    path = f"src/m{(s >> 16) % 50}/f{i}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}/{path}@{i}".encode()).hexdigest()[:12]
    kw = _KEYWORDS[lang]
    words: list[str] = []
    n_words = 30 + (s % 170)
    t = s
    for j in range(n_words):
        t = _lcg(t + j)
        r = t % 100
        if r < 18:
            words.append(HOT_TERMS[t % len(HOT_TERMS)])
        elif r < 40:
            words.append(kw[t % len(kw)])
        elif r < 70:
            words.append(f"localVar{t % 37}")
        else:
            words.append(f"helper_func_{t % 53}")
    if i % 97 == 0:
        words.append(RARE_TERMS[i % len(RARE_TERMS)])
    if i % 997 == 0:
        words.extend(RARE_TERMS)  # a few docs contain every rare term
    content = f"// {repo}/{path}\n" + " ".join(words)
    return (repo, path, commit, lang, content, i)


def synth_corpus(spark: SparkSession, n_rows: int = 2000, n_partitions: int = 8) -> DataFrame:
    """Distributed deterministic corpus: generated on executors from a range
    (no driver-side collect; scales by construction)."""

    def gen_partition(rows):
        import pandas as pd

        for pdf in rows:
            out = [_gen_row(int(i), n_rows) for i in pdf["id"]]
            yield pd.DataFrame(out, columns=["repo", "path", "commit", "lang", "content", "seq_no"])

    rng = spark.range(0, n_rows, numPartitions=n_partitions)
    return rng.mapInPandas(gen_partition, schema=CORPUS_SCHEMA)


def with_duplicates(corpus: DataFrame, every: int = 13) -> DataFrame:
    """Append newer-commit duplicates for a slice of (repo, path) keys to
    exercise last-write-wins upsert (reference: bulk.go:179-195)."""
    dups = (
        corpus.filter(F.col("seq_no") % every == 0)
        .withColumn("commit", F.concat(F.lit("dup"), F.col("commit")))
        .withColumn("content", F.concat(F.col("content"), F.lit(" revisedEdition")))
        .withColumn("seq_no", F.col("seq_no") + F.lit(1_000_000))
    )
    return corpus.unionByName(dups)


def load_documents_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver documents.parquet -> corpus shape (FIXTURES.md §7 shim).

    Path is zero-padded so lexicographic (repo, path) order == numeric
    doc_id order; engine doc_ids then coincide with the table's doc_ids and
    top-k tie-breaks match SQL oracles exactly."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.lit("corpus").alias("repo"),
        F.format_string("doc/%012d", F.col("doc_id")).alias("path"),
        F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.col("doc_id").cast("int").alias("seq_no"),
        # numeric metadata passthrough: IndexBuilder(docvalue_cols=
        # ["n_chars"]) makes it range-filterable (ES range query)
        F.col("n_chars").cast("long").alias("n_chars"),
    )
