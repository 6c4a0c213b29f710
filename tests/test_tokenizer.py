"""Tokenizer: golden cases + 4-way mirror identity (python / pandas UDF /
Spark expression / DuckDB SQL) — the analyzer every other component trusts."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.functions.tokenizer import (
    tokenize_duckdb_sql,
    tokenize_expr,
    tokenize_py,
    tokenize_udf,
)

GOLDEN = [
    ("getValueFromCache", ["get", "value", "from", "cache"]),
    ("snake_case_name", ["snake", "case", "name"]),
    ("HTTPServer2x", ["httpserver2x"]),  # no lower->upper boundary inside HTTP
    ("parseHTTPResponse", ["parse", "httpresponse"]),
    ("foo.bar(baz_qux)", ["foo", "bar", "baz", "qux"]),
    ("x := y + 42  // comment", ["x", "y", "42", "comment"]),
    ("", []),
    (None, []),
    ("___", []),
    ("camelCase123Next", ["camel", "case123", "next"]),
]


def test_golden_python():
    for text, want in GOLDEN:
        assert tokenize_py(text) == want, text


def test_mirrors_agree(spark):
    texts = [t for t, _ in GOLDEN if t] + [
        "def helperFunc_one(x): return x.getValue() + OBSIDIAN_marker",
        "SELECT * FROM t WHERE a=1 -- trailingComment",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    spark_rows = (
        df.withColumn("udf_toks", tokenize_udf(F.col("text")))
        .withColumn("expr_toks", tokenize_expr("text"))
        .collect()
    )
    con = duckdb.connect()
    for r in spark_rows:
        want = tokenize_py(r["text"])
        assert list(r["udf_toks"]) == want, r["text"]
        assert list(r["expr_toks"]) == want, r["text"]
        got = con.sql(
            f"select {tokenize_duckdb_sql('?')} as toks", params=[r["text"]]
        ).fetchone()[0]
        assert list(got) == want, r["text"]


def test_murmur3_int32_matches_spark(spark):
    """The numpy murmur3 mirror must be BIT-EXACT with Spark's F.hash over
    an int column (negatives, extremes included) — BM25Query._shard_salts
    computes the perfect-partitioner salt map locally with it."""
    from pyspark.sql import functions as F

    from go_dcp_elasticsearch_spark.functions.hashing import murmur3_int32

    vals = (
        list(range(-1000, 1000))
        + [2**31 - 1, -(2**31), 123456789, -987654321, 42]
    )
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v int")
        .select("v", F.hash("v").alias("h"))
        .collect()
    )
    want = {r["v"]: int(r["h"]) for r in rows}
    mine = murmur3_int32(vals)
    assert all(int(m) == want[v] for v, m in zip(vals, mine))


def test_tokenize_py_fast_path_equals_reference_spec():
    """r7: tokenize_py was rewritten (lookaround camel gap + findall) for
    speed; brute-force it against the original spec formulation over the
    full mixed alphabet so the 4-mirror identity cannot drift."""
    import itertools
    import re

    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py

    camel = re.compile(r"([a-z0-9])([A-Z])")
    split = re.compile(r"[^a-z0-9]+")

    def reference(text):
        if not text:
            return []
        s = camel.sub(r"\1 \2", text).lower()
        return [t for t in split.split(s) if t]

    alpha = "aB1_ ."
    for n in range(1, 5):
        for tup in itertools.product(alpha, repeat=n):
            s = "".join(tup)
            assert tokenize_py(s) == reference(s), repr(s)
    for s in ["aBC", "aBcD", "ABc", "a1B2c", "snakeCaseCamelX",
              "x" * 500 + "Y", "ÅngstrømUniCode aB", "123Abc", "",
              None, "ALLCAPS", "aA" * 200]:
        assert tokenize_py(s) == reference(s), repr(s)
