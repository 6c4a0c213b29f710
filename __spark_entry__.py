"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship: build the compressed sharded index over the
                  sf0.001 documents corpus and run a block-max-pruned BM25
                  top-k query through the full engine.
queries()      -> one entry per implemented operator from SURVEY.md §2
                  (A-table pipeline semantics + B-table native capabilities
                  + training-data ops).
oracle_sql()   -> DuckDB mirrors. Hash-critical discipline: every computed
                  column is aliased identically on both sides; floats are
                  rounded to 6 dp on both sides; all hashes are md5 (same
                  bytes in Spark and DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from go_dcp_elasticsearch_spark.functions.bm25 import (
    B,
    K1,
    bm25_duckdb_sql,
    round6_expr,
    round6_sql,
)
from go_dcp_elasticsearch_spark.functions.tokenizer import (
    tokenize_duckdb_sql,
    tokenize_expr,
)

# ---------------------------------------------------------------------------
# fixed parameters shared by Spark queries and DuckDB oracles
# ---------------------------------------------------------------------------

BM25_TERMS = ["spark", "filter", "join"]

# phrase gate query (ES match_phrase analogue): ordered token sequence.
# "table scan" is discriminative on the fixture corpus: ~30 consecutive
# matches vs ~320 docs containing both terms, so the verify step provably
# filters (measured at sf0.001 and sf0.01).
PHRASE_TOKENS = ["table", "scan"]
# phrase slop gate: the same pair with ONE token of in-order slack —
# SQL-expressible for a 2-token phrase (tokens[i]=a and b within i+1+slop)
PHRASE_SLOP = 1

# prefix gate query (ES prefix / multi-term rewrite): the fixture
# vocabulary has six s-terms (scan slow small sort spark stream), so the
# max_expansions=4 cap provably truncates (lexicographic first-N).
PREFIX_Q = "s"
PREFIX_MAX_EXP = 4

# bool gate query (ES bool: must + should/minimum_should_match + must_not).
# Every clause bites on the fixture corpus: "spark" df~385/500, "dup" is
# the rare tail term (df~25, big idf boost when matched), "window" df~387,
# and excluding "customer" (df~394) cuts the candidate set ~5x.
BOOL_MUST = "spark"
BOOL_SHOULD = "dup window"
BOOL_NOT = "customer"
BOOL_MSM = 1

# bool filter-context gate query: filter clauses require but never score
# (ES filter context), so hits matching only the filter carry score 0.0
# and the rare "dup" should-boost reorders the rest — zero-score ties,
# the filter conjunction and the boost all exercised in one query.
BOOLF_SHOULD = "dup"
BOOLF_FILTER = "spark window"
BOOLF_NOT = "customer"

# keyword-field gate query: the oracle index carries lang:<value> field
# postings (IndexBuilder field_cols=["lang"]); filtering on lang:en is a
# posting-list operation in the engine and a plain column predicate in
# the SQL mirror — the ES keyword-field term query served natively.
FIELD_SHOULD = "dup"
FIELD_FILTER = "lang:en"
FIELD_NOT = "customer"

# terms-query gate (ES `terms` query): disjunctive keyword filter — the
# doc must carry ANY of the listed lang values' postings; filter
# context (score-0 hits stay), with a should boost on top. The mirror
# is a plain IN predicate.
TERMSQ_SHOULD = "dup"
TERMSQ_VALUES = ["en", "fr"]

# range gate queries (ES range query over numeric doc-values): the
# oracle index carries n_chars as a docvalue column (IndexBuilder
# docvalue_cols=["n_chars"]); the bounds are a pushed parquet predicate
# on the docs scan in the engine and a plain column predicate in the
# SQL mirror. range_topk exercises the scored semi-join path (must
# bounds candidates); range_filter_topk the filter-context-universe
# path (no must/filter, msm 0: ALL range docs qualify, should only
# boosts, score-0 hits surface, must_not excludes).
RANGE_MUST = "spark"
RANGE_SHOULD = "dup"
RANGE_GTE, RANGE_LT = 150, 320
RANGEU_SHOULD = "spark"
RANGEU_NOT = "window"
RANGEU_GTE, RANGEU_LT = 150, 260

# highlight gate query (ES highlight analogue): deterministic
# token-stream fragment around the FIRST query-term match, window tokens
# each side, every query term inside wrapped in <em></em> — the rule is
# exactly SQL-expressible (list_position/list_slice/list_transform),
# unlike ES's fuzzy sentence windows.
HL_WINDOW = 4

# aggregation gate queries (ES aggs analogue): terms/stats over the
# docs matching a must query, histogram over match_all — the engine
# reduces the full match set (never the top-k page), the mirror is the
# equivalent GROUP BY over the token-qualified documents.
AGG_MUST = "spark"
AGG_TERMS_SIZE = 5
AGG_HIST_INTERVAL = 50.0

# fuzzy gate query (ES fuzzy, closest-first scoring rewrite): "spar" at
# max_edits=2 reaches spark (d=1) plus several d=2 terms (part, scan, …)
# in the fixture vocabulary, so the (distance, term)-ordered cap at 3
# provably truncates.
FUZZY_Q = "spar"
FUZZY_EDITS = 2
FUZZY_PFX = 0
FUZZY_MAX_EXP = 3

# wildcard gate query (ES wildcard, scoring rewrite): 5-char terms with
# 2nd char 'a' and last 'e' — matches exactly {table, value} in the
# fixture vocabulary (both ? positions constrained).
WILD_PATTERN = "?a??e"
WILD_MAX_EXP = 4
BM25_K = 10
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "des", "est"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it"]
COLLECTION_INDEX_MAPPING = {lang: f"idx_{lang}" for lang in LANGS}
MINHASH_N, MINHASH_BAND = 6, 3
SHINGLE_N = 3
JACCARD_THRESHOLD = 0.5
BATCH_SIZE_LIMIT = 100
BATCH_BYTE_LIMIT = 500  # small enough that the BYTE trigger binds before the count trigger
EMB_DIM = 64
EMB_DUP_THRESHOLD = 0.35
EMB_DUP_BANDS, EMB_DUP_BAND_BITS = 4, 4
ANN_PLANES, ANN_MAX_HAMMING = 8, 3
IVF_CELLS, IVF_PROBE = 16, 4
LSH_SEED = 42

_TOKS_SQL = tokenize_duckdb_sql("text")

# md5 hex -> int64 halves (hi = bits 63..32, lo = bits 31..0); every engine
# parses the same first-16-hex-chars big-endian value _md5_64 uses
_HEX_HI = (
    "list_sum(list_transform(range(1,9), i -> (strpos('0123456789abcdef', "
    "substr({h},i,1)) - 1)::BIGINT * (1::BIGINT << (4*(8-i)))))::BIGINT"
)
_HEX_LO = (
    "list_sum(list_transform(range(9,17), i -> (strpos('0123456789abcdef', "
    "substr({h},i,1)) - 1)::BIGINT * (1::BIGINT << (4*(16-i)))))::BIGINT"
)


def _plane_sql(p: str, dim: int = EMB_DIM, seed: int = LSH_SEED) -> str:
    """DuckDB fragment mirroring similarity.md5_planes row ``p``."""
    return (
        f"list_transform(range(0, {dim}), d -> CASE WHEN strpos('01234567', "
        f"substr(md5('{seed}:' || CAST({p} AS VARCHAR) || ':' || CAST(d AS VARCHAR)), 1, 1)) > 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine end-to-end on sf0.001 (build -> pruned query).
    Shares the fingerprint-guarded cached oracle index (stale /tmp state
    from an earlier fixture generation is detected and rebuilt)."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, "/root/testdata/sf0.001")
    q = BM25Query(spark, idx_dir)
    return q.topk_pruned(" ".join(BM25_TERMS), BM25_K).select(
        "doc_id", round6_expr(F.col("score")).alias("score")
    )


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9/B10 declarative path: tokenize -> tf/df/dl -> BM25 -> top-k."""
    docs = _docs(spark, sf_dir).select("doc_id", tokenize_expr("text").alias("tokens"))
    dl = docs.select("doc_id", F.size("tokens").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
            * F.col("tf")
            / (F.col("tf") + F.lit(K1) * (F.lit(1.0) - F.lit(B) + F.lit(B) * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
    )


def _fixture_fingerprint(sf_dir: str) -> str:
    """Cheap fingerprint of the documents fixture (file names + sizes +
    mtimes — zero Spark jobs) PLUS the index format version. Regenerated
    driver testdata at the SAME path — or a format change in a later
    round — changes the fingerprint and invalidates the cached /tmp
    oracle index, which would otherwise serve stale results forever
    (resume=True skips completed builds)."""
    import hashlib

    from go_dcp_elasticsearch_spark.index.builder import INDEX_FORMAT_VERSION

    path = f"{sf_dir}/documents.parquet"
    # fields=lang + dv=n_chars: the oracle index carries keyword-field
    # postings and numeric doc-values (round 6); the tag invalidates
    # caches built before either feature existed
    parts = [f"fmt{INDEX_FORMAT_VERSION}+fields=lang+dv=n_chars+pos"]
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, fn))
            parts.append(f"{fn}:{st.st_size}:{int(st.st_mtime)}")
    else:
        st = os.stat(path)
        parts.append(f"{st.st_size}:{int(st.st_mtime)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def _oracle_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or resume) the per-fixture cached oracle index, guarded by
    the fixture fingerprint."""
    import hashlib
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import IndexBuilder

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    idx_dir = os.path.join(tempfile.gettempdir(), f"ft_oracle_idx_{tag}")
    fp = _fixture_fingerprint(sf_dir)
    fp_file = os.path.join(idx_dir, "_fixture_fp")
    if os.path.exists(idx_dir):
        stale = True
        if os.path.exists(fp_file):
            with open(fp_file) as f:
                stale = f.read().strip() != fp
        if stale:
            shutil.rmtree(idx_dir, ignore_errors=True)
    IndexBuilder(
        spark, idx_dir, n_shards=4, field_cols=["lang"],
        docvalue_cols=["n_chars"], positions=True,
    ).build(load_documents_corpus(spark, sf_dir), resume=True)
    with open(fp_file, "w") as f:
        f.write(fp)
    return idx_dir


def _q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine: compressed sharded index + block-max pruned retrieval.
    Same oracle as the declarative path — proves codec+shard+prune exactness."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    out = q.topk_pruned(" ".join(BM25_TERMS), BM25_K)
    # engine doc_id = rank over (repo=source, path='doc/'||doc_id); map back
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        out.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
    )


def _q_bm25_topk_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive retrieval (ES bool.must): docs containing EVERY query
    term, BM25-ranked — mode='all' through the full compressed index.
    Conjunction is decided per shard (a doc's postings all live in its
    one shard), filtered BEFORE the block-max threshold so pruning stays
    sound on the reduced candidate set. idf/df stay corpus-wide, exactly
    as in the SQL mirror's HAVING formulation. Like every gate query
    whose engine ids can tie on rounded scores, this one takes a k+64
    candidate margin and re-ranks by the PUBLIC (rounded score, doc_key)
    tie-break — the engine's internal-id tie-break at the K boundary
    would otherwise diverge from the oracle's ORDER BY."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_pruned(" ".join(BM25_TERMS), BM25_K + 64, mode="all")
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_bool_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES bool filter context through the full engine: filter clauses
    require membership but never score (id-stream decodes with UB 0 in
    the pruned kernel), so filter-only matches surface at score 0.0 and
    the should clause re-ranks the docs it boosts — the ES
    filter-context contract. Same k+64 margin + public re-rank as the
    other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        should=BOOLF_SHOULD, filter=BOOLF_FILTER, must_not=BOOLF_NOT,
        k=BM25_K + 64, minimum_should_match=0,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_bool_field_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-field filter through the full engine: the index carries
    one lang:<value> posting per doc (field_cols=["lang"], tf=1, never
    scored, dl/avgdl untouched), so filtering on metadata is a pure
    posting-list operation — the ES keyword-field term query. Combined
    here with a should boost and a text must_not; the SQL mirror uses
    the plain lang column predicate. Same k+64 margin + public re-rank
    as the other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        should=FIELD_SHOULD, filter=FIELD_FILTER, must_not=FIELD_NOT,
        k=BM25_K + 64, minimum_should_match=0,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_terms_query_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms query through the full engine: the doc must carry ANY of
    the lang values' keyword postings (disjunctive within the column,
    filter context — posting-list work only, no docs-table scan), the
    should clause boosts, score-0 hits stay. Same k+64 margin + public
    re-rank as the other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        should=TERMSQ_SHOULD, terms_filter={"lang": TERMSQ_VALUES},
        k=BM25_K + 64, minimum_should_match=0,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_range_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range query through the full engine, scored semi-join path:
    the must clause bounds the candidates (postings), the n_chars
    doc-value bounds push into the docs parquet scan and semi-join in.
    Same k+64 margin + public re-rank as the other index-backed gate
    queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        must=RANGE_MUST, should=RANGE_SHOULD, k=BM25_K + 64,
        minimum_should_match=0,
        range={"n_chars": {"gte": RANGE_GTE, "lt": RANGE_LT}},
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_range_filter_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range query, filter-context-universe path: no must/filter
    terms and msm 0, so EVERY doc inside the n_chars bounds qualifies —
    the should clause only boosts, score-0 hits surface ordered by
    doc_id, and must_not excludes via its id-streams. Same k+64 margin
    + public re-rank as the other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        should=RANGEU_SHOULD, must_not=RANGEU_NOT, k=BM25_K + 64,
        minimum_should_match=0,
        range={"n_chars": {"gte": RANGEU_GTE, "lt": RANGEU_LT}},
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_search_after_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES search_after deep pagination through the full engine: page 1's
    last (score, doc_id) becomes the cursor and page 2 returns the next
    BM25_K hits — rank-identical to the oracle's OFFSET page. Engine ids
    equal public ids on this fixture (zero-padded path order), so the
    cursor's doc_id tie-break matches the oracle's ORDER BY doc_id."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    text = " ".join(BM25_TERMS)
    p1 = q.topk_pruned(text, BM25_K).collect()
    cursor = (float(p1[-1]["score"]), int(p1[-1]["doc_id"]))
    hits = q.topk_pruned(text, BM25_K, after=cursor)
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
    )


def _q_highlight_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES highlight through the full engine: top-k hits joined (hit-side
    broadcast) to the source content under the per-row sha256 invariant,
    one fragment around the first match, matched terms wrapped. Engine
    ids equal public ids on this fixture."""
    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    text = " ".join(BM25_TERMS)
    hits = q.topk_pruned(text, BM25_K)
    hl = q.highlight(
        hits, text, load_documents_corpus(spark, sf_dir),
        window=HL_WINDOW, max_fragments=1,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hl.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select(
            "doc_id",
            round6_expr(F.col("score")).alias("score"),
            F.element_at("fragments", 1).alias("fragment"),
        )
    )


def _q_agg_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation through the full engine: top-N (value,
    doc_count) buckets of the lang keyword field over EVERY doc matching
    the must query (not the top-k page), ordered (doc_count desc, value
    asc) — the ES _count/_key order. No id mapping needed: aggregation
    output carries no doc ids."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    return q.agg_terms("lang", size=AGG_TERMS_SIZE, must=AGG_MUST)


def _q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats aggregation through the full engine: (count, min, max,
    avg, sum) of the n_chars doc-value over every doc matching the must
    query. avg is rounded to 6dp on both sides (float association order
    differs between engines)."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    out = q.agg_stats("n_chars", must=AGG_MUST)
    return out.select(
        "count", "min", "max",
        round6_expr(F.col("avg")).alias("avg"), "sum",
    )


def _q_agg_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation (exact mode for the gate; the default
    is the same HyperLogLog++ sketch family ES uses)."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    return q.agg_cardinality("lang", exact=True, must=AGG_MUST)


def _q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation through the full engine over match_all:
    bucket = floor(n_chars/interval)*interval, non-empty buckets only
    (ES min_doc_count=1), ordered by bucket."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    return q.agg_histogram("n_chars", AGG_HIST_INTERVAL)


def _q_fuzzy_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES fuzzy query through the full engine: (distance, term)-ordered
    first-N dictionary expansion (plain Levenshtein, driver-side, zero
    extra jobs), then pruned disjunctive BM25 with per-term corpus idf.
    Same k+64 margin + public (rounded score, doc_id) re-rank as the
    other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_fuzzy(
        FUZZY_Q, BM25_K + 64, max_edits=FUZZY_EDITS,
        prefix_length=FUZZY_PFX, max_expansions=FUZZY_MAX_EXP,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_wildcard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES wildcard query through the full engine: lexicographic first-N
    dictionary expansion of the */? pattern (driver-side), then pruned
    disjunctive BM25. Same k+64 margin + public re-rank as the other
    index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_wildcard(WILD_PATTERN, BM25_K + 64, max_expansions=WILD_MAX_EXP)
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bool`` query through the full engine: must-conjunction +
    should clauses under minimum_should_match + must_not exclusion, all
    decided per shard inside the block-max pruned kernel (must_not
    postings are id-stream decodes only). Score = BM25 over matched
    must+should terms; must_not filters, never scores. Same k+64 margin
    + public (rounded score, doc_id) re-rank as the other index-backed
    gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_bool(
        must=BOOL_MUST, should=BOOL_SHOULD, must_not=BOOL_NOT,
        k=BM25_K + 64, minimum_should_match=BOOL_MSM,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_phrase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase retrieval (ES match_phrase analogue) through the full
    engine: conjunctive posting intersection bounds the candidates, the
    consecutive-subsequence test re-tokenizes ONLY candidates' content
    from the source table (the index stores content_sha256, not content —
    the invariant is enforced per candidate row), BM25-ranked over the
    phrase's distinct terms. Same k+64 margin + public (rounded score,
    doc_id) re-rank as the other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_phrase(
        " ".join(PHRASE_TOKENS), BM25_K + 64,
        source=load_documents_corpus(spark, sf_dir),
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_phrase_slop_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy phrase (match_phrase slop analogue, in-order span-near):
    the phrase tokens in order with at most PHRASE_SLOP extra tokens
    inside the span. Same candidate bounding, sha enforcement and k+64
    margin + public re-rank as the exact-phrase gate."""
    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_phrase(
        " ".join(PHRASE_TOKENS), BM25_K + 64,
        source=load_documents_corpus(spark, sf_dir), slop=PHRASE_SLOP,
    )
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_phrase_pos_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INDEX-ONLY phrase (positional sidecar, ES index_options:positions
    analogue): same semantics as phrase_topk but verified by span-near
    over decoded position lists — no source table in the plan. Shares
    phrase_topk's oracle SQL."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_phrase(" ".join(PHRASE_TOKENS), BM25_K + 64)
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_prefix_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix retrieval (ES prefix query, scoring multi-term rewrite)
    through the full engine: deterministic lexicographic first-N
    expansion from the epoch-cached dictionary (zero extra Spark jobs),
    then the standard pruned disjunctive BM25 over the expanded terms.
    Same k+64 margin + public (rounded score, doc_id) re-rank as the
    other index-backed gate queries."""
    from go_dcp_elasticsearch_spark.index import BM25Query

    idx_dir = _oracle_index(spark, sf_dir)
    q = BM25Query(spark, idx_dir)
    hits = q.topk_prefix(PREFIX_Q, BM25_K + 64, max_expansions=PREFIX_MAX_EXP)
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_term_df_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 dictionary: top-50 terms by document frequency (salted agg path
    is exercised in the engine; this mirrors its output relationally)."""
    docs = _docs(spark, sf_dir).select("doc_id", tokenize_expr("text").alias("tokens"))
    df_ = (
        docs.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    return df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(50)


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(F.size(tokenize_expr("text")).alias("dl"))
    return docs.agg(
        F.count("*").alias("n_docs"), round6_expr(F.avg("dl")).alias("avgdl")
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.text import token_count

    return token_count(_docs(spark, sf_dir), "text", "doc_id")


def _q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.text import quality_score

    return quality_score(_docs(spark, sf_dir), "text", "doc_id")


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.text import language_id

    return language_id(_docs(spark, sf_dir), "text", "doc_id")


def _q_term_df_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """north_rule skew handling: the SAME dictionary as term_df_topn but
    through the explicit salted two-phase aggregation (hot terms split
    into (term, salt) partial aggregates, then merged)."""
    from go_dcp_elasticsearch_spark.index.builder import IndexBuilder

    docs = _docs(spark, sf_dir).select(
        F.col("doc_id"), tokenize_expr("text").alias("tokens")
    )
    tf = (
        docs.select("doc_id", F.explode("tokens").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    b = IndexBuilder.__new__(IndexBuilder)  # only need the salting method
    b.n_salts = 8
    out = b.salted_dictionary(tf)
    return out.orderBy(F.col("df").desc(), F.col("term").asc()).limit(50)


def _q_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint, oracle-checkable variant: min md5 over
    rolling 8-token windows (string min == lexicographic in both engines)."""
    toks = tokenize_expr("text")
    n = 8
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    windows = F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i, n))))
    fp = (
        F.when(F.size(toks) >= n, F.array_min(windows))
        .when(F.size(toks) > 0, F.md5(F.concat_ws(" ", toks)))
        .otherwise(F.lit(None))
    )
    return _docs(spark, sf_dir).select("doc_id", fp.alias("fingerprint_md5"))


def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir), "text", "doc_id")


def _q_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: last-write-wins per (user_id, event_type), ordering authority
    (ts, event_id) — the batchKeys replace-in-place semantics."""
    from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins

    ev = _events(spark, sf_dir).withColumn(
        "_ord", F.struct(F.col("ts"), F.col("event_id"))
    )
    out = last_write_wins(ev, ["user_id", "event_type"], "_ord")
    return out.select("user_id", "event_type", "event_id", round6_expr(F.col("value")).alias("value"))


def _q_event_dispatch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 dispatch + A17 grouped counters: op/action x count."""
    from go_dcp_elasticsearch_spark.operators.dispatch import (
        default_mapper,
        dispatch_events,
    )

    ev = dispatch_events(_events(spark, sf_dir)).withColumn(
        "key", F.col("user_id").cast("string")
    )
    actions = default_mapper(ev, key_col="key", value_col="props")
    return actions.groupBy("action").agg(F.count("*").alias("n_actions"))


def _q_index_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: collection->index lookup (lang plays collection), counts per index."""
    from go_dcp_elasticsearch_spark.operators.dispatch import resolve_index_name

    docs = _docs(spark, sf_dir).withColumnRenamed("lang", "collection")
    resolved = resolve_index_name(docs, COLLECTION_INDEX_MAPPING, explicit_col=None)
    return resolved.groupBy("index_name").agg(F.count("*").alias("n_docs"))


def _q_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A10/A12: count-triggered batch assignment per sink cluster
    (event_type plays cluster_key), then per-batch sizes."""
    from go_dcp_elasticsearch_spark.operators.batching import plan_batches

    ev = _events(spark, sf_dir).withColumnRenamed("event_type", "cluster_key")
    planned = plan_batches(
        ev, cluster_col="cluster_key", order_col="event_id", size_col=None,
        batch_size_limit=BATCH_SIZE_LIMIT,
    )
    return planned.groupBy("cluster_key", "batch_id").agg(F.count("*").alias("n_actions"))


def _q_batch_plan_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 byte trigger: batch_id increments when EITHER the running count
    hits batch_size_limit OR the running byte size hits the byte limit —
    both data-driven flush triggers of bulk.go:206-208 in one plan."""
    from go_dcp_elasticsearch_spark.operators.batching import plan_batches

    ev = (
        _events(spark, sf_dir)
        .withColumnRenamed("event_type", "cluster_key")
        .withColumn("byte_size", F.length("props"))
    )
    planned = plan_batches(
        ev, cluster_col="cluster_key", order_col="event_id",
        size_col="byte_size", batch_size_limit=BATCH_SIZE_LIMIT,
        batch_byte_limit=BATCH_BYTE_LIMIT,
    )
    return planned.groupBy("cluster_key", "batch_id").agg(
        F.count("*").alias("n_actions"),
        F.sum("byte_size").alias("batch_bytes"),
    )


def _q_batch_plan_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 reference-EXACT flush semantics: both accumulators reset at
    every flush (bulk.go:284-318), so a byte-triggered early flush
    restarts the count AND byte numbering — unlike the cumulative-crossing
    plan of batch_plan_bytes. DuckDB mirror: recursive CTE over batch
    BOUNDARIES (one recursion step per batch, not per row)."""
    from go_dcp_elasticsearch_spark.operators.batching import plan_batches_reset

    ev = (
        _events(spark, sf_dir)
        .withColumnRenamed("event_type", "cluster_key")
        .withColumn("byte_size", F.length("props"))
    )
    planned = plan_batches_reset(
        ev, cluster_col="cluster_key", order_col="event_id",
        size_col="byte_size", batch_size_limit=BATCH_SIZE_LIMIT,
        batch_byte_limit=BATCH_BYTE_LIMIT,
    )
    return planned.groupBy("cluster_key", "batch_id").agg(
        F.count("*").alias("n_actions"),
        F.sum("byte_size").alias("batch_bytes"),
    )


def _q_mapper_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 1->N custom mapper: one DCP event fans out to multiple actions
    (mapper.go:8 returns []ESActionDocument; 'update multiple documents
    for a DCP event', README.md:13) — select + explode, no UDF."""
    from go_dcp_elasticsearch_spark.operators.dispatch import dispatch_events

    ev = dispatch_events(_events(spark, sf_dir))
    n = (F.col("event_id") % 3 + 1).cast("int")
    acts = ev.select(
        "event_id", "op",
        F.explode(F.sequence(F.lit(0), n - F.lit(1))).alias("replica"),
    )
    return acts.select(
        F.concat_ws(":", F.col("event_id"), F.col("replica")).alias("doc_key"),
        F.when(F.col("op") == "mutation", F.lit("index"))
        .otherwise(F.lit("delete"))
        .alias("action"),
    )


def _q_serialize_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9: ES Bulk NDJSON envelope rendering (index + delete actions)."""
    from go_dcp_elasticsearch_spark.operators.dispatch import (
        default_mapper,
        dispatch_events,
        serialize_bulk_ndjson,
    )

    ev = dispatch_events(_events(spark, sf_dir)).withColumn(
        "key", F.col("event_id").cast("string")
    )
    actions = default_mapper(ev, key_col="key", value_col="props").withColumn(
        "index_name", F.lit("idx_events")
    )
    return serialize_bulk_ndjson(actions).select("doc_key", "bulk_line")


def _q_serialize_bulk_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5/A8: envelope WITH routing (bulk.go:246-249) — routing present on
    ~2/3 of rows, omitted (null) on the rest to exercise both branches."""
    from go_dcp_elasticsearch_spark.operators.dispatch import serialize_bulk_ndjson

    ev = _events(spark, sf_dir)
    actions = ev.select(
        F.col("event_id").cast("string").alias("doc_key"),
        F.when(
            F.col("event_type").isin("click", "view", "signup", "purchase"),
            F.lit("index"),
        ).otherwise(F.lit("delete")).alias("action"),
        F.when(
            F.col("event_type").isin("click", "view", "signup", "purchase"),
            F.col("props"),
        ).alias("source"),
        F.lit("idx_events").alias("index_name"),
        F.when(F.col("user_id") % 3 != 0, F.col("user_id").cast("string")).alias(
            "routing"
        ),
    )
    return serialize_bulk_ndjson(actions, routing_col="routing").select(
        "doc_key", "bulk_line"
    )


def _q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.dedup import (
        minhash_band_buckets,
        minhash_candidate_pairs,
    )

    buckets = minhash_band_buckets(
        _docs(spark, sf_dir), "text", "doc_id",
        n_hashes=MINHASH_N, band_size=MINHASH_BAND, shingle_n=SHINGLE_N,
    )
    return minhash_candidate_pairs(buckets)


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup endgame: connected components over the MinHash candidate
    pairs — every doc labeled with its cluster's canonical (min) id and a
    keep flag (pairwise keep-lowest under-deletes transitive groups).
    Spark side: iterative min-label propagation to fixpoint; DuckDB
    mirror: recursive transitive closure."""
    from go_dcp_elasticsearch_spark.operators.dedup import (
        dedup_clusters,
        keep_per_cluster,
        minhash_band_buckets,
        minhash_candidate_pairs,
    )

    docs = _docs(spark, sf_dir)
    pairs = minhash_candidate_pairs(
        minhash_band_buckets(
            docs, "text", "doc_id",
            n_hashes=MINHASH_N, band_size=MINHASH_BAND, shingle_n=SHINGLE_N,
        )
    )
    clusters = dedup_clusters(docs.select(F.col("doc_id").alias("id")), pairs)
    return keep_per_cluster(clusters)


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), "text", "doc_id", shingle_n=SHINGLE_N,
        threshold=JACCARD_THRESHOLD,
    )


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.similarity import brute_force_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_force_topk(emb, list(qvec), "embedding", "vec_id", k=10)


def _q_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed (the 100 TB path): candidates
    share >=1 of 4 band buckets (4 md5-plane sign bits each), exact cosine
    re-rank >= threshold. Deterministic planes -> full DuckDB oracle."""
    from go_dcp_elasticsearch_spark.operators.dedup import embedding_cosine_dups

    return embedding_cosine_dups(
        _emb(spark, sf_dir), "embedding", "vec_id",
        threshold=EMB_DUP_THRESHOLD, method="lsh",
        n_bands=EMB_DUP_BANDS, band_bits=EMB_DUP_BAND_BITS,
        seed=LSH_SEED, dim=EMB_DIM,
    ).select(
        F.col("id_a").alias("vec_a"), F.col("id_b").alias("vec_b"), "cosine"
    )


def _q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, driver-oracled: documents' text bytes play the
    opaque video payload; the frame sampler does the real work (binary
    column pruned to (id, payload, duration), 1->N frame explode INSIDE
    the Arrow kernel, bounded by max_frames) with an md5 fake decode."""
    from go_dcp_elasticsearch_spark.operators.multimodal import sample_video_frames_md5

    media = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        ((F.col("doc_id") % 10 + 1) * F.lit(900)).cast("long").alias("duration_ms"),
    )
    return sample_video_frames_md5(media, every_ms=1000, max_frames=8)


def _q_changes_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1/B2: CDC apply — events as the change feed over empty state;
    final state = newest action per key unless it is a delete."""
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes

    ev = _events(spark, sf_dir)
    changes = ev.select(
        F.col("user_id").alias("doc_key"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("index"))
        .alias("action"),
        F.col("props").alias("content"),
        F.struct(F.col("ts"), F.col("event_id")).alias("seq"),
    )
    state = spark.createDataFrame([], "doc_key long, content string")
    out = apply_changes(state, changes, ["doc_key"], "content", "seq")
    return out.select("doc_key", F.md5("content").alias("content_hash"))


def _q_index_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star invariant: per-row content sha256 equality of the built
    index's docs table against the source corpus — a full-outer key join
    with map-side sha (content never shuffles). On an uncorrupted build
    every row is ok; the DuckDB mirror states that expectation over the
    same source table (missing/extra/mismatch provably 0 because the docs
    table is derived from exactly these rows)."""
    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import verify_index_against_source

    idx_dir = _oracle_index(spark, sf_dir)
    corpus = load_documents_corpus(spark, sf_dir)
    out = verify_index_against_source(spark, idx_dir, corpus)
    return spark.createDataFrame(
        [(out["n_docs"], out["n_source"], out["missing_in_index"],
          out["extra_in_index"], out["sha_mismatch"], out["n_ok"])],
        "n_docs long, n_source long, missing_in_index long, "
        "extra_in_index long, sha_mismatch long, n_ok long",
    )


def _q_snapshot_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 snapshot-range incremental read, end-to-end through the REAL
    store: events split 3 ways by event_id % 3 — slice 0 bootstraps the
    mirror (snapshot 0), slices 1 and 2 are committed as snapshots 1 and
    2; read_changes_between(0, 2) returns the NET per-key feed of (0, 2]
    — newest (snapshot_id, seq_no) wins across the two commits. The store
    directory is recreated from scratch each call (idempotent across
    driver runs). Exercises commit (LWW + changelog partition write +
    mirror upsert) AND the pruned range read; the DuckDB mirror is the
    collapsed window over the same event partitioning."""
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.sources.snapshots import SnapshotStore

    tag = sf_dir.rstrip("/").split("/")[-1]
    store_dir = f"{tempfile.gettempdir()}/spark_entry_snapstore_{tag}"
    shutil.rmtree(store_dir, ignore_errors=True)

    ev = _events(spark, sf_dir).select(
        F.col("user_id").alias("doc_key"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("index"))
        .alias("action"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        F.col("props").alias("content"),
        F.col("event_id").cast("long").alias("seq_no"),
        (F.col("event_id") % 3).cast("int").alias("_snap"),
    ).withColumn(
        "content", F.when(F.col("action") == "delete", F.lit(None)).otherwise(F.col("content"))
    )
    store = SnapshotStore(spark, store_dir, key_cols=["doc_key"])
    store.bootstrap(
        ev.filter(F.col("_snap") == 0)
        .select("doc_key", "commit", "lang", "content", "seq_no")
    )
    for s in (1, 2):
        store.commit(ev.filter(F.col("_snap") == s).drop("_snap"))
    out = store.read_changes_between(0, 2)
    return out.select(
        F.col("doc_key").cast("long").alias("doc_key"),
        "action",
        F.md5(F.coalesce(F.col("content"), F.lit(""))).alias("content_hash"),
        F.col("snapshot_id").cast("int").alias("snapshot_id"),
        F.col("seq_no").cast("long").alias("seq_no"),
    )


def _q_stream_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL reference loop under the DuckDB gate: bootstrap an index
    from slice-0 state, then drive slices 1 and 2 as change FILES through
    the real Structured Streaming body (stream_changes_to_index:
    checkpointed availableNow micro-batches -> LWW dedup -> mirror upsert
    -> incremental shard rebuild) and return the final QUERYABLE index
    state (docs table: key, doc_len by our tokenizer, content sha256).
    Composes A1+A7+A10+A18 with B1/B2/B6 end-to-end. seq_no is offset by
    slice*10^12 so the per-key winner is the same under ANY micro-batch
    split (the oracle is robust to file-source batching; 10^12 keeps the
    slices' seq ranges disjoint for any event_id the sf scale can mint,
    and 2*10^12+10^12 is far inside int64)."""
    import os
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.index import IndexBuilder
    from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins
    from go_dcp_elasticsearch_spark.streaming.pipeline import (
        stream_changes_to_index,
        write_corpus_mirror,
    )

    tag = sf_dir.rstrip("/").split("/")[-1]
    base = f"{tempfile.gettempdir()}/spark_entry_streamidx_{tag}"
    shutil.rmtree(base, ignore_errors=True)
    idx, src, ckpt = f"{base}/idx", f"{base}/src", f"{base}/ckpt"
    os.makedirs(src)

    ev = _events(spark, sf_dir).select(
        F.lit("ev").alias("repo"),
        F.concat(F.lit("doc/"), F.col("user_id")).alias("path"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("index"))
        .alias("action"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("props"))
        .alias("content"),
        ((F.col("event_id") % 3) * F.lit(1_000_000_000_000) + F.col("event_id"))
        .cast("long")
        .alias("seq_no"),
        (F.col("event_id") % 3).cast("int").alias("_slice"),
    )
    # bootstrap STATE = fold of the slice-0 feed (newest action per key,
    # kept if index) — the mirror holds one row per key by contract
    boot = (
        last_write_wins(ev.filter(F.col("_slice") == 0), ["repo", "path"], "seq_no")
        .filter(F.col("action") == "index")
        .drop("_slice", "action")
    )
    write_corpus_mirror(spark, idx, boot, n_buckets=4)
    IndexBuilder(spark, idx, n_shards=2).build(boot)

    # one change FILE per slice, mtime-ordered for the file source
    for s in (1, 2):
        staging = f"{base}/_stage{s}"
        ev.filter(F.col("_slice") == s).drop("_slice").coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(f"{staging}/{part}", f"{src}/batch-{s}.parquet")
        os.utime(f"{src}/batch-{s}.parquet", (1_700_000_000 + s, 1_700_000_000 + s))

    schema = ev.drop("_slice").schema
    q = stream_changes_to_index(
        spark, src, schema, idx, ckpt,
        key_cols=["repo", "path"], max_files_per_trigger=1,
    )
    q.awaitTermination()

    docs = spark.read.parquet(f"{idx}/docs")
    return docs.select(
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_key"),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("content_sha256"),
    )


def _q_delta_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-SEGMENT incremental apply (round 5, index.segments) under the
    gate: bootstrap an index from the slice-0 fold of events, then apply
    slices 1+2 as ONE change feed through strategy='delta' — no base
    shard is rewritten; the changed docs land in a tiny segment with
    tombstones for superseded ids (the Lucene update model the
    reference's sink runs on). Returned state is the LIVE docs view
    (base ∪ segment, tombstones dropped) WITHOUT folding — proving
    segment visibility, tombstone filtering and the new-id contract.
    Mirror: fold of the whole stream (same SQL as stream_apply — the
    physical write path differs, the state contract does not)."""
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.index import IndexBuilder
    from go_dcp_elasticsearch_spark.index.segments import read_docs
    from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

    tag = sf_dir.rstrip("/").split("/")[-1]
    idx = f"{tempfile.gettempdir()}/spark_entry_deltaapply_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    ev = _events(spark, sf_dir).select(
        F.lit("ev").alias("repo"),
        F.concat(F.lit("doc/"), F.col("user_id")).alias("path"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("index"))
        .alias("action"),
        F.lit("c0").alias("commit"),
        F.lit("py").alias("lang"),
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("props"))
        .alias("content"),
        ((F.col("event_id") % 3) * F.lit(1_000_000_000_000) + F.col("event_id"))
        .cast("long")
        .alias("seq_no"),
        (F.col("event_id") % 3).cast("int").alias("_slice"),
    )
    boot = (
        last_write_wins(ev.filter(F.col("_slice") == 0), ["repo", "path"], "seq_no")
        .filter(F.col("action") == "index")
        .drop("_slice", "action")
    )
    IndexBuilder(spark, idx, n_shards=2).build(boot)
    changes = ev.filter(F.col("_slice") != 0).drop("_slice")
    # post-change corpus = fold winners of the WHOLE stream (slice offsets
    # keep the per-key winner identical to the oracle's argmax by seq)
    new_corpus = (
        last_write_wins(ev, ["repo", "path"], "seq_no")
        .filter(F.col("action") == "index")
        .drop("_slice", "action")
    )
    apply_changes_to_index(spark, idx, new_corpus, changes, strategy="delta")
    return read_docs(spark, idx).select(
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_key"),
        F.col("doc_len").cast("long").alias("doc_len"),
        F.col("content_sha256"),
    )


DELTA_TOPK_TERMS = ["spark", "filter", "join", "zzdeltatoken"]


def _delta_gate_fixture(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Shared fixture for the delta gate queries: build the base index
    WITHOUT the insert slice (doc_id%7=3), then apply ONE delta-strategy
    feed carrying those inserts, content updates (+' zzdeltatoken',
    doc_id%11=5) and deletes (doc_id%13=4). Raises (explicitly — `python
    -O` strips asserts) unless the apply took the delta path and left a
    pending, un-folded segment; callers fold or serve-as-is. Returns the
    index dir."""
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index import IndexBuilder
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

    tag = sf_dir.rstrip("/").split("/")[-1]
    idx = f"{tempfile.gettempdir()}/spark_entry_{name}_{tag}"
    shutil.rmtree(idx, ignore_errors=True)

    corpus = load_documents_corpus(spark, sf_dir)
    key = F.regexp_replace("path", "^doc/", "").cast("long")
    ins_m = (key % 7) == 3
    upd_m = ((key % 11) == 5) & ~ins_m
    del_m = ((key % 13) == 4) & ~ins_m & ~upd_m
    IndexBuilder(spark, idx, n_shards=4).build(corpus.filter(~ins_m))
    new_corpus = corpus.filter(~del_m).withColumn(
        "content",
        F.when(upd_m, F.concat(F.col("content"), F.lit(" zzdeltatoken")))
        .otherwise(F.col("content")),
    )
    changes = corpus.filter(ins_m | upd_m | del_m).select(
        "repo", "path",
        F.when(del_m, F.lit("delete")).otherwise(F.lit("index")).alias("action"),
        (F.col("seq_no") + F.lit(10_000_000)).cast("long").alias("seq_no"),
    )
    out = apply_changes_to_index(spark, idx, new_corpus, changes, strategy="delta")
    if out["strategy"] != "delta" or out["segment"] is None or out["folded"]:
        raise RuntimeError(
            f"{name} gate: expected a delta-path apply with a pending "
            f"un-folded segment (strategy={out['strategy']!r}, "
            f"segment={out['segment']!r}, folded={out['folded']!r})"
        )
    return idx


def _q_delta_fold_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segments end-to-end under the NUMERIC gate: the shared delta
    fixture (insert/update/delete feed through the segment path), then
    fold_segments (the Lucene merge analogue — restores exact df), then
    block-max-pruned BM25 top-k. Updated and inserted docs carry NEW
    internal ids, so the public tie-break is (rounded score, doc_key):
    the engine takes a k+64 candidate margin and re-ranks exactly like
    the oracle's ORDER BY."""
    from go_dcp_elasticsearch_spark.index import BM25Query
    from go_dcp_elasticsearch_spark.index.segments import fold_segments

    idx = _delta_gate_fixture(spark, sf_dir, "deltafold")
    fold_segments(spark, idx)
    q = BM25Query(spark, idx)
    hits = q.topk_pruned(" ".join(DELTA_TOPK_TERMS), BM25_K + 64)
    docs = spark.read.parquet(f"{idx}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_delta_conj_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive retrieval (ES bool.must) under PENDING delta segments
    + tombstones — NO fold: the same update/insert/delete feed as
    delta_fold_topk is applied through the segment path and queried
    immediately, so the kernels' cnt == require_n conjunction and the
    tombstone drop are gated together in the between-folds state a CDC
    consumer serves from constantly. Statistics follow the documented
    pre-fold Lucene docFreq trade (n_docs/avgdl exact; df = base
    dictionary + segment contributions, dead docs still counted, clamped
    to n_docs) — mirrored exactly by the oracle's split df source."""
    from go_dcp_elasticsearch_spark.index import BM25Query
    from go_dcp_elasticsearch_spark.index.builder import IndexPaths
    from go_dcp_elasticsearch_spark.index.segments import has_segments, read_docs

    idx = _delta_gate_fixture(spark, sf_dir, "deltaconj")
    if not has_segments(spark, IndexPaths(idx)):
        raise RuntimeError("delta_conj_topk gate: segment vanished before query")
    q = BM25Query(spark, idx)
    hits = q.topk_pruned(" ".join(BM25_TERMS), BM25_K + 64, mode="all")
    # id -> public key via the LIVE view (updated/inserted docs' ids only
    # exist in the segments); public (rounded score, doc_key) re-rank
    docs = read_docs(spark, idx).select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


ROUTED_INSERTS = [
    ("corpus", "doc/999000000001", "cz1", "python",
     "zzroutedinsert spark filter alpha"),
    ("corpus", "doc/999000000002", "cz2", "go",
     "zzroutedinsert join filter beta beta"),
]


def _q_routed_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5+B11 under the gate: routing-placed build + routed incremental
    INSERT + query, all through the IndexCatalog namespace (the
    reference's ClusterKey+IndexName routing, config.go:40 +
    connector.go:257-276; routing per action, document.go:16 +
    bulk.go:246-249). Placement is asserted IN-LINE (a misrouted insert
    raises, failing the gate loudly); scores are placement-invariant, so
    the oracle is plain BM25 over the post-insert corpus with the public
    (rounded score, doc_key) tie-break."""
    import shutil
    import tempfile

    from go_dcp_elasticsearch_spark.corpus import load_documents_corpus
    from go_dcp_elasticsearch_spark.index.catalog import IndexCatalog
    from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

    tag = sf_dir.rstrip("/").split("/")[-1]
    root = f"{tempfile.gettempdir()}/spark_entry_catalog_{tag}"
    shutil.rmtree(root, ignore_errors=True)

    cat = IndexCatalog(spark, root)
    corpus = load_documents_corpus(spark, sf_dir)
    cat.builder("code", n_shards=4, routing_col="lang").build(corpus)
    idx_dir = cat._dir("code")

    ins = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4], 90_000_000 + i) for i, r in enumerate(ROUTED_INSERTS)],
        "repo string, path string, commit string, lang string, content string, seq_no long",
    ).withColumn("n_chars", F.length("content").cast("long"))
    changes = ins.select(
        "repo", "path", F.lit("index").alias("action"), F.col("seq_no")
    )
    apply_changes_to_index(spark, idx_dir, corpus.unionByName(ins), changes)

    # routed-placement invariant: every inserted doc sits in
    # pmod(hash(routing), routing_n_shards) — the ingest-time co-location
    # contract; violated placement fails the gate as an error
    want = {
        r["lang"]: int(r["s"])
        for r in spark.createDataFrame(
            [(x[3],) for x in ROUTED_INSERTS], "lang string"
        ).select("lang", F.pmod(F.hash("lang"), F.lit(4)).alias("s")).collect()
    }
    got = (
        spark.read.parquet(f"{idx_dir}/docs")
        .filter(F.col("path").startswith("doc/9990000000"))
        .select("lang", "shard")
        .collect()
    )
    for r in got:
        if int(r["shard"]) != want[r["lang"]]:
            raise AssertionError(
                f"routed insert misplaced: lang={r['lang']} shard={r['shard']} "
                f"want={want[r['lang']]}"
            )

    q = cat.query("code")
    hits = q.topk_pruned("zzroutedinsert spark filter join", BM25_K + 64)
    docs = spark.read.parquet(f"{idx_dir}/docs").select(
        F.col("doc_id").alias("engine_id"),
        F.regexp_replace("path", "^doc/", "").cast("long").alias("doc_id"),
    )
    return (
        hits.withColumnRenamed("doc_id", "engine_id")
        .join(docs, "engine_id")
        .select("doc_id", round6_expr(F.col("score")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(BM25_K)
    )


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.dedup import simhash64

    return simhash64(_docs(spark, sf_dir), "text", "doc_id")


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.text import fingerprint

    return fingerprint(_docs(spark, sf_dir), "text", "doc_id")


def _q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_dcp_elasticsearch_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return lsh_topk(
        emb, list(qvec), "embedding", "vec_id", k=10,
        n_planes=ANN_PLANES, dim=len(qvec), seed=LSH_SEED,
        max_hamming=ANN_MAX_HAMMING,
    )


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN scale path: deterministic coarse quantizer (lowest-id
    vectors as centroids), probe the 4 nearest of 16 cells, exact re-rank
    of candidates — fully SQL-mirrorable, so assignment + probe + re-rank
    are all oracle-checked."""
    from go_dcp_elasticsearch_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_topk(
        emb, list(qvec), "embedding", "vec_id", k=10,
        n_cells=IVF_CELLS, n_probe=IVF_PROBE,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": _q_bm25_topk,
        "bm25_topk_indexed": _q_bm25_topk_indexed,
        "bm25_topk_conj": _q_bm25_topk_conj,
        "phrase_topk": _q_phrase_topk,
        "phrase_slop_topk": _q_phrase_slop_topk,
        "phrase_pos_topk": _q_phrase_pos_topk,
        "bool_topk": _q_bool_topk,
        "bool_filter_topk": _q_bool_filter_topk,
        "bool_field_topk": _q_bool_field_topk,
        "terms_query_topk": _q_terms_query_topk,
        "range_topk": _q_range_topk,
        "range_filter_topk": _q_range_filter_topk,
        "search_after_topk": _q_search_after_topk,
        "highlight_topk": _q_highlight_topk,
        "agg_terms": _q_agg_terms,
        "agg_stats": _q_agg_stats,
        "agg_histogram": _q_agg_histogram,
        "agg_cardinality": _q_agg_cardinality,
        "fuzzy_topk": _q_fuzzy_topk,
        "wildcard_topk": _q_wildcard_topk,
        "prefix_topk": _q_prefix_topk,
        "term_df_topn": _q_term_df_topn,
        "term_df_salted": _q_term_df_salted,
        "fingerprint_md5": _q_fingerprint_md5,
        "doc_stats": _q_doc_stats,
        "token_count": _q_token_count,
        "quality_score": _q_quality_score,
        "language_id": _q_language_id,
        "exact_dedup": _q_exact_dedup,
        "lww_dedup": _q_lww_dedup,
        "event_dispatch_counts": _q_event_dispatch_counts,
        "index_resolution": _q_index_resolution,
        "batch_plan": _q_batch_plan,
        "batch_plan_bytes": _q_batch_plan_bytes,
        "batch_plan_reset": _q_batch_plan_reset,
        "mapper_explode": _q_mapper_explode,
        "serialize_bulk": _q_serialize_bulk,
        "serialize_bulk_routing": _q_serialize_bulk_routing,
        "minhash_lsh_pairs": _q_minhash_lsh_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_topk": _q_embedding_topk,
        "embedding_dups": _q_embedding_dups,
        "media_frames": _q_media_frames,
        "changes_apply": _q_changes_apply,
        "index_verify": _q_index_verify,
        "snapshot_range_read": _q_snapshot_range_read,
        "stream_apply": _q_stream_apply,
        "delta_apply": _q_delta_apply,
        "delta_fold_topk": _q_delta_fold_topk,
        "delta_conj_topk": _q_delta_conj_topk,
        "routed_catalog": _q_routed_catalog,
        "simhash": _q_simhash,
        "fingerprint": _q_fingerprint,
        "ann_lsh_topk": _q_ann_lsh_topk,
        "ivf_topk": _q_ivf_topk,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------


def _sql_shingles(tokens_expr: str, n: int = SHINGLE_N) -> str:
    """shingles as list<string> from a token-array SQL fragment."""
    return (
        f"list_transform(range(1, greatest(len({tokens_expr}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string(list_slice({tokens_expr}, i, i + {n - 1}), ' '))"
    )


def oracle_sql() -> dict[str, str]:
    bm25 = bm25_duckdb_sql(_TOKS_SQL, "documents", "doc_id", BM25_TERMS, BM25_K)

    lang_counts = ", ".join(
        f"len(list_filter(tokens, t -> list_contains({LANG_MARKERS[lang]!r}, t))) AS c_{lang}"
        for lang in LANGS
    )
    # argmax with (count desc, lang asc) tie-break
    best_lang = "CASE " + " ".join(
        f"WHEN c_{lang} = m AND {' AND '.join(f'c_{l2} < m' for l2 in LANGS if l2 < lang)} THEN '{lang}'"
        if lang != LANGS[0]
        else f"WHEN c_{lang} = m THEN '{lang}'"
        for lang in LANGS
    ) + " END"

    stop_list = repr(STOPWORDS)
    mapping_case = " ".join(
        f"WHEN lang = '{k}' THEN '{v}'" for k, v in sorted(COLLECTION_INDEX_MAPPING.items())
    )

    mh_sigs = ", ".join(
        f"list_min(list_transform(sh, s -> substr(md5(s), {i * 5 + 1}, 5))) AS mh{i}"
        for i in range(MINHASH_N)
    )
    n_bands = MINHASH_N // MINHASH_BAND
    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, md5("
        + " || '|' || ".join(f"mh{b * MINHASH_BAND + j}" for j in range(MINHASH_BAND))
        + ") AS bucket FROM sigs"
        for b in range(n_bands)
    )

    # delta_fold_topk: BM25 over the POST-CHANGE corpus (inserts doc_id%7=3
    # restored, updates doc_id%11=5 carry ' zzdeltatoken', deletes
    # doc_id%13=4 removed; del excludes keys claimed by ins/upd)
    delta_fold_src = (
        "(SELECT doc_id, CASE WHEN doc_id % 11 = 5 AND doc_id % 7 <> 3 "
        "THEN text || ' zzdeltatoken' ELSE text END AS text FROM documents "
        "WHERE NOT (doc_id % 13 = 4 AND doc_id % 7 <> 3 AND doc_id % 11 <> 5)"
        ") final"
    )
    delta_fold = bm25_duckdb_sql(
        _TOKS_SQL, delta_fold_src, "doc_id", DELTA_TOPK_TERMS, BM25_K
    )
    # delta_conj_topk: conjunctive BM25 over the SAME post-change live
    # corpus, but with the PRE-FOLD df semantics (no fold has run): df
    # counts the base build corpus (inserts excluded; old versions of
    # updated docs and deleted docs still counted — their postings sit in
    # the base dictionary) plus the delta's new doc versions (updates'
    # patched text + inserts — their postings sit in the segment). iid
    # disambiguates the two instances of an updated doc (2*id / 2*id+1).
    delta_conj_df_src = (
        "(SELECT doc_id * 2 AS iid, text FROM documents WHERE doc_id % 7 <> 3 "
        "UNION ALL "
        "SELECT doc_id * 2 + 1 AS iid, "
        "CASE WHEN doc_id % 11 = 5 AND doc_id % 7 <> 3 "
        "THEN text || ' zzdeltatoken' ELSE text END AS text FROM documents "
        "WHERE doc_id % 7 = 3 OR (doc_id % 11 = 5 AND doc_id % 7 <> 3)"
        ") dfsrc"
    )
    delta_conj = bm25_duckdb_sql(
        _TOKS_SQL, delta_fold_src, "doc_id", BM25_TERMS, BM25_K,
        require_all=True, df_source_sql=delta_conj_df_src,
    )
    # routed_catalog: scores are placement-invariant, so the oracle is
    # plain BM25 over documents + the two routed-insert literals
    routed_src = (
        "(SELECT doc_id, text FROM documents UNION ALL "
        + " UNION ALL ".join(
            f"SELECT CAST({int(r[1].split('/')[1])} AS BIGINT) AS doc_id, "
            f"'{r[4]}' AS text"
            for r in ROUTED_INSERTS
        )
        + ") src"
    )
    routed = bm25_duckdb_sql(
        _TOKS_SQL, routed_src, "doc_id",
        ["zzroutedinsert", "spark", "filter", "join"], BM25_K,
    )

    sqls = {
        "bm25_topk": bm25,
        "bm25_topk_indexed": bm25,
        "bm25_topk_conj": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", BM25_TERMS, BM25_K,
            require_all=True,
        ),
        "phrase_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", PHRASE_TOKENS, BM25_K,
            require_all=True, phrase=PHRASE_TOKENS,
        ),
        "phrase_pos_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", PHRASE_TOKENS, BM25_K,
            require_all=True, phrase=PHRASE_TOKENS,
        ),
        "phrase_slop_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", PHRASE_TOKENS, BM25_K,
            require_all=True,
            extra_doc_where="len(list_filter(range(1, len(tokens) + 1), i -> tokens[i] = 'table' AND (coalesce(tokens[i+1], '') = 'scan' OR coalesce(tokens[i+2], '') = 'scan'))) > 0",
        ),
        "prefix_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            prefix_expand=(PREFIX_Q, PREFIX_MAX_EXP),
        ),
        "bool_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            bool_spec={
                "must": BOOL_MUST.split(),
                "should": BOOL_SHOULD.split(),
                "must_not": BOOL_NOT.split(),
                "msm": BOOL_MSM,
            },
        ),
        "terms_query_topk": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens, lang FROM documents),
dl AS (SELECT doc_id, len(tokens) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  WHERE t.term IN ('{TERMSQ_SHOULD}')
  GROUP BY doc_id, t.term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT t.doc_id, {round6_sql("coalesce(s.score, 0.0)")} AS score
FROM toks t LEFT JOIN scored s USING (doc_id)
WHERE lower(t.lang) IN ({", ".join(f"'{v}'" for v in TERMSQ_VALUES)})
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_K}
""",
        "range_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            bool_spec={
                "must": RANGE_MUST.split(),
                "should": RANGE_SHOULD.split(),
                "msm": 0,
            },
            range_where=f"n_chars >= {RANGE_GTE} AND n_chars < {RANGE_LT}",
        ),
        "range_filter_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            bool_spec={
                "should": RANGEU_SHOULD.split(),
                "must_not": RANGEU_NOT.split(),
                "msm": 0,
            },
            range_where=f"n_chars >= {RANGEU_GTE} AND n_chars < {RANGEU_LT}",
            range_universe=True,
        ),
        "highlight_topk": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents),
hits AS (
{bm25_duckdb_sql(_TOKS_SQL, "documents", "doc_id", BM25_TERMS, BM25_K)}
),
hl AS (
  SELECT h.doc_id, h.score, t.tokens,
         least({", ".join(f"coalesce(nullif(list_position(t.tokens, '{x}'), 0), 1000000000)" for x in BM25_TERMS)}) AS m1,
         len(t.tokens) AS n
  FROM hits h JOIN toks t USING (doc_id)
)
SELECT doc_id, score,
       array_to_string(
         list_transform(
           list_slice(tokens, greatest(1, m1 - {HL_WINDOW}), least(n, m1 + {HL_WINDOW})),
           tk -> CASE WHEN tk IN ({", ".join(f"'{x}'" for x in BM25_TERMS)})
                      THEN '<em>' || tk || '</em>' ELSE tk END
         ), ' ') AS fragment
FROM hl
ORDER BY score DESC, doc_id ASC
""",
        "search_after_topk": f"""
SELECT doc_id, score FROM (
{bm25_duckdb_sql(_TOKS_SQL, "documents", "doc_id", BM25_TERMS, 2 * BM25_K)}
) page1and2
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_K} OFFSET {BM25_K}
""",
        "agg_terms": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens, lang FROM documents)
SELECT lang AS value, count(*) AS doc_count
FROM toks
WHERE list_contains(tokens, '{AGG_MUST}')
GROUP BY lang
ORDER BY doc_count DESC, value ASC
LIMIT {AGG_TERMS_SIZE}
""",
        "agg_stats": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens, n_chars FROM documents)
SELECT count(n_chars) AS count,
       CAST(min(n_chars) AS DOUBLE) AS min,
       CAST(max(n_chars) AS DOUBLE) AS max,
       {round6_sql("avg(n_chars)")} AS avg,
       CAST(sum(n_chars) AS DOUBLE) AS sum
FROM toks
WHERE list_contains(tokens, '{AGG_MUST}')
""",
        "agg_cardinality": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens, lang FROM documents)
SELECT count(DISTINCT lang) AS value
FROM toks
WHERE list_contains(tokens, '{AGG_MUST}')
""",
        "agg_histogram": f"""
SELECT CAST(floor(n_chars / {AGG_HIST_INTERVAL}) * {AGG_HIST_INTERVAL} AS DOUBLE) AS bucket,
       count(*) AS doc_count
FROM documents
GROUP BY 1
ORDER BY bucket ASC
""",
        # keyword-field filter: engine filters via lang:<value> postings;
        # the mirror uses the plain column predicate. LEFT JOIN keeps
        # filter-context docs with no scoring match at score 0.0 (the
        # tf-CTE-based builder can't express that universe, hence
        # handwritten).
        "bool_field_topk": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens, lang FROM documents),
dl AS (SELECT doc_id, len(tokens) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, t.term, count(*) AS tf
  FROM toks, unnest(tokens) AS t(term)
  WHERE t.term IN ('{FIELD_SHOULD}')
  GROUP BY doc_id, t.term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         sum( ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
            ) AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT t.doc_id, {round6_sql("coalesce(s.score, 0.0)")} AS score
FROM toks t LEFT JOIN scored s USING (doc_id)
WHERE lower(t.lang) = '{FIELD_FILTER.split(":", 1)[1]}'
  AND NOT list_contains(t.tokens, '{FIELD_NOT}')
ORDER BY score DESC, doc_id ASC
LIMIT {BM25_K}
""",
        "bool_filter_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            bool_spec={
                "should": BOOLF_SHOULD.split(),
                "filter": BOOLF_FILTER.split(),
                "must_not": BOOLF_NOT.split(),
                "msm": 0,
            },
        ),
        "fuzzy_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            fuzzy_expand=(FUZZY_Q, FUZZY_EDITS, FUZZY_PFX, FUZZY_MAX_EXP),
        ),
        "wildcard_topk": bm25_duckdb_sql(
            _TOKS_SQL, "documents", "doc_id", [], BM25_K,
            wildcard_expand=(WILD_PATTERN, WILD_MAX_EXP),
        ),
        "delta_fold_topk": delta_fold,
        "delta_conj_topk": delta_conj,
        "routed_catalog": routed,
        "term_df_topn": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents),
d AS (SELECT t.term, count(*) AS df FROM toks,
      unnest(list_distinct(tokens)) AS t(term) GROUP BY t.term)
SELECT term, df FROM d ORDER BY df DESC, term ASC LIMIT 50
""",
        "term_df_salted": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents),
tf AS (SELECT doc_id, t.term, count(*) AS tf FROM toks,
       unnest(tokens) AS t(term) GROUP BY doc_id, t.term),
d AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf FROM tf GROUP BY term)
SELECT term, df, cf FROM d ORDER BY df DESC, term ASC LIMIT 50
""",
        "fingerprint_md5": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents)
SELECT doc_id,
  CASE WHEN len(tokens) >= 8 THEN
    list_min(list_transform(range(1, len(tokens) - 6),
      i -> md5(array_to_string(list_slice(tokens, i, i + 7), ' '))))
  WHEN len(tokens) > 0 THEN md5(array_to_string(tokens, ' '))
  ELSE NULL END AS fingerprint_md5
FROM toks
""",
        "doc_stats": f"""
WITH dl AS (SELECT len({_TOKS_SQL}) AS dl FROM documents)
SELECT count(*) AS n_docs, floor(avg(dl) * 1000000 + 0.5) / 1000000.0 AS avgdl FROM dl
""",
        "token_count": f"""
SELECT doc_id,
       len({_TOKS_SQL}) AS n_tokens,
       len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS n_words
FROM documents
""",
        "quality_score": f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         {_TOKS_SQL} AS tokens
  FROM documents
), m AS (
  SELECT doc_id, n_chars, n_punct, len(tokens) AS n_tokens,
         len(list_filter(tokens, t -> list_contains({stop_list}, t))) AS n_stop
  FROM base
)
SELECT doc_id, n_tokens,
  floor((CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS punct_ratio,
  floor((CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS stopword_ratio,
  floor((CASE WHEN n_tokens > 0 THEN n_chars / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 1000000 + 0.5) / 1000000.0 AS mean_word_len,
  floor((0.4 * least(n_chars / 500.0, 1.0)
      + 0.3 * (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / CAST(n_chars AS DOUBLE) ELSE 0.0 END) * 4, 1.0))
      + 0.3 * least((CASE WHEN n_tokens > 0 THEN n_stop / CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * 5, 1.0)) * 1000000 + 0.5) / 1000000.0 AS quality
FROM m
""",
        "language_id": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents),
c AS (SELECT doc_id, {lang_counts} FROM toks),
mx AS (SELECT *, greatest({", ".join(f"c_{lang}" for lang in LANGS)}) AS m FROM c)
SELECT doc_id, {best_lang} AS pred_lang, m AS marker_hits FROM mx
""",
        "exact_dedup": """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
        "lww_dedup": """
SELECT user_id, event_type, event_id, floor(value * 1000000 + 0.5) / 1000000.0 AS value FROM (
  SELECT user_id, event_type, event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
        "event_dispatch_counts": """
SELECT CASE WHEN event_type IN ('click','view','signup','purchase')
            THEN 'index' ELSE 'delete' END AS action,
       count(*) AS n_actions
FROM events GROUP BY 1
""",
        "index_resolution": f"""
SELECT CASE {mapping_case} END AS index_name, count(*) AS n_docs
FROM documents GROUP BY 1
""",
        "batch_plan": f"""
WITH planned AS (
  SELECT event_type AS cluster_key,
         CAST(floor((row_number() OVER (PARTITION BY event_type ORDER BY event_id ASC) - 1)
              / {BATCH_SIZE_LIMIT}) AS BIGINT) AS batch_id
  FROM events
)
SELECT cluster_key, batch_id, count(*) AS n_actions
FROM planned GROUP BY cluster_key, batch_id
""",
        "batch_plan_bytes": f"""
WITH a AS (SELECT event_type AS cluster_key, event_id,
                  length(props) AS byte_size FROM events),
w AS (
  SELECT cluster_key, byte_size,
         row_number() OVER (PARTITION BY cluster_key ORDER BY event_id ASC) - 1 AS rn,
         sum(byte_size) OVER (PARTITION BY cluster_key ORDER BY event_id ASC
                              ROWS UNBOUNDED PRECEDING) AS run_bytes
  FROM a
)
SELECT cluster_key,
       greatest(CAST(floor(rn / {BATCH_SIZE_LIMIT}.0) AS BIGINT),
                CAST(floor((run_bytes - byte_size) / {BATCH_BYTE_LIMIT}.0) AS BIGINT)) AS batch_id,
       count(*) AS n_actions,
       CAST(sum(byte_size) AS BIGINT) AS batch_bytes
FROM w GROUP BY 1, 2
""",
        "batch_plan_reset": f"""
WITH RECURSIVE base AS (
  SELECT event_type AS cluster_key, length(props) AS byte_size,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id ASC) AS rn,
         sum(length(props)) OVER (PARTITION BY event_type ORDER BY event_id ASC
                                  ROWS UNBOUNDED PRECEDING) AS prefix
  FROM events
),
-- greedy segmentation: one recursion step per BATCH; the next boundary is
-- min(count boundary, first row whose bytes-since-last-flush >= limit)
seg AS (
  SELECT cluster_key, CAST(0 AS BIGINT) AS base_prefix,
         CAST(-1 AS BIGINT) AS bid, CAST(0 AS BIGINT) AS end_rn
  FROM (SELECT DISTINCT cluster_key FROM base)
  UNION ALL
  SELECT s.cluster_key,
         (SELECT b.prefix FROM base b
          WHERE b.cluster_key = s.cluster_key AND b.rn = e.end_rn) AS base_prefix,
         s.bid + 1 AS bid,
         e.end_rn
  FROM seg s,
  LATERAL (
    SELECT least(
      s.end_rn + {BATCH_SIZE_LIMIT},
      coalesce((SELECT min(b.rn) FROM base b
                WHERE b.cluster_key = s.cluster_key AND b.rn > s.end_rn
                  AND b.prefix - s.base_prefix >= {BATCH_BYTE_LIMIT}),
               (SELECT max(b.rn) FROM base b WHERE b.cluster_key = s.cluster_key))
    ) AS end_rn
  ) e
  WHERE s.end_rn < (SELECT max(b.rn) FROM base b WHERE b.cluster_key = s.cluster_key)
),
seg2 AS (
  SELECT cluster_key, bid, end_rn,
         lag(end_rn, 1, CAST(0 AS BIGINT))
           OVER (PARTITION BY cluster_key ORDER BY bid) AS prev_end
  FROM seg WHERE bid >= 0
)
SELECT b.cluster_key, s.bid AS batch_id, count(*) AS n_actions,
       CAST(sum(b.byte_size) AS BIGINT) AS batch_bytes
FROM base b JOIN seg2 s
  ON b.cluster_key = s.cluster_key AND b.rn > s.prev_end AND b.rn <= s.end_rn
GROUP BY 1, 2
""",
        "mapper_explode": """
SELECT CAST(event_id AS VARCHAR) || ':' || CAST(r.replica AS VARCHAR) AS doc_key,
       CASE WHEN event_type IN ('click','view','signup','purchase')
            THEN 'index' ELSE 'delete' END AS action
FROM events, unnest(range(0, event_id % 3 + 1)) AS r(replica)
""",
        "serialize_bulk": """
SELECT CAST(event_id AS VARCHAR) AS doc_key,
  CASE WHEN event_type IN ('click','view','signup','purchase')
    THEN '{"index":{"_index":"idx_events","_id":"' ||
         regexp_replace(CAST(event_id AS VARCHAR), '"', '\\"', 'g') || '"}}' ||
         chr(10) || props
    ELSE '{"delete":{"_index":"idx_events","_id":"' ||
         regexp_replace(CAST(event_id AS VARCHAR), '"', '\\"', 'g') || '"}}'
  END AS bulk_line
FROM events
""",
        "serialize_bulk_routing": """
SELECT CAST(event_id AS VARCHAR) AS doc_key,
  CASE WHEN event_type IN ('click','view','signup','purchase')
    THEN '{"index":{"_index":"idx_events","_id":"' ||
         regexp_replace(CAST(event_id AS VARCHAR), '"', '\\"', 'g') ||
         CASE WHEN user_id % 3 <> 0
              THEN '","routing":"' || CAST(user_id AS VARCHAR) ELSE '' END ||
         '"}}' || chr(10) || props
    ELSE '{"delete":{"_index":"idx_events","_id":"' ||
         regexp_replace(CAST(event_id AS VARCHAR), '"', '\\"', 'g') ||
         CASE WHEN user_id % 3 <> 0
              THEN '","routing":"' || CAST(user_id AS VARCHAR) ELSE '' END ||
         '"}}'
  END AS bulk_line
FROM events
""",
        "minhash_lsh_pairs": f"""
WITH toks AS (SELECT doc_id AS id, {_TOKS_SQL} AS tokens FROM documents),
sh_t AS (SELECT id, {_sql_shingles("tokens")} AS sh FROM toks),
sigs AS (SELECT id, {mh_sigs} FROM sh_t WHERE len(sh) > 0),
buckets AS ({band_rows})
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.id < b.id
""",
        "dedup_clusters": f"""
WITH RECURSIVE toks AS (SELECT doc_id AS id, {_TOKS_SQL} AS tokens FROM documents),
sh_t AS (SELECT id, {_sql_shingles("tokens")} AS sh FROM toks),
sigs AS (SELECT id, {mh_sigs} FROM sh_t WHERE len(sh) > 0),
buckets AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.id < b.id
),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
-- transitive closure: r = every node reachable from id; UNION dedups,
-- so recursion terminates at the component closure
reach AS (
  SELECT doc_id AS id, doc_id AS r FROM documents
  UNION
  SELECT reach.id, e.dst AS r FROM reach JOIN edges e ON e.src = reach.r
)
SELECT id, min(r) AS cluster_id, (id = min(r)) AS keep
FROM reach GROUP BY id
""",
        "ngram_jaccard": f"""
WITH toks AS (SELECT doc_id AS id, {_TOKS_SQL} AS tokens FROM documents),
sh AS (SELECT DISTINCT id, s.sh FROM toks,
       unnest({_sql_shingles("tokens")}) AS s(sh)),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       floor((n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE)) * 1000000 + 0.5) / 1000000.0 AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE n_common / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= {JACCARD_THRESHOLD}
""",
        "embedding_topk": """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         floor((list_dot_product(embedding::DOUBLE[], qv) /
               (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                sqrt(list_dot_product(qv, qv)))) * 1000000 + 0.5) / 1000000.0 AS cosine
  FROM embeddings, q
)
SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
        "changes_apply": """
SELECT doc_key, md5(content) AS content_hash FROM (
  SELECT user_id AS doc_key, props AS content,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'index' END AS action,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND action <> 'delete'
""",
        "index_verify": """
SELECT count(*) AS n_docs, count(*) AS n_source,
       CAST(0 AS BIGINT) AS missing_in_index,
       CAST(0 AS BIGINT) AS extra_in_index,
       CAST(0 AS BIGINT) AS sha_mismatch,
       count(*) AS n_ok
FROM documents
""",
        "snapshot_range_read": """
-- net change feed of snapshot range (0, 2]: events sliced by
-- event_id % 3 (slice 0 = bootstrap, slices 1/2 = committed snapshots);
-- per key the newest (snapshot_id, seq_no) wins across the range
WITH ch AS (
  SELECT user_id AS doc_key,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'index' END AS action,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content,
         CAST(event_id AS BIGINT) AS seq_no,
         CAST(event_id % 3 AS INT) AS snapshot_id
  FROM events
  WHERE event_id % 3 IN (1, 2)
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_key ORDER BY snapshot_id DESC, seq_no DESC
  ) AS rn
  FROM ch
)
SELECT CAST(doc_key AS BIGINT) AS doc_key, action,
       md5(coalesce(content, '')) AS content_hash, snapshot_id, seq_no
FROM r WHERE rn = 1
""",
        "stream_apply": f"""
-- final queryable index state after bootstrap(slice 0) + two streamed
-- micro-batches (slices 1, 2): seq = slice*10^12 + event_id makes the
-- per-key winner invariant under any micro-batch split, so the fold of
-- the whole stream = argmax by seq; winner 'delete' => key absent.
-- doc_len = our code-aware tokenizer; sha256 identical in both engines.
WITH ev AS (
  SELECT user_id AS doc_key,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'index' END AS action,
         CASE WHEN event_type = 'error' THEN NULL ELSE props END AS content,
         CAST((event_id % 3) * 1000000000000 + event_id AS BIGINT) AS seq
  FROM events
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_key ORDER BY seq DESC) AS rn
  FROM ev
)
SELECT CAST(doc_key AS BIGINT) AS doc_key,
       CAST(len({tokenize_duckdb_sql("content")}) AS BIGINT) AS doc_len,
       sha256(content) AS content_sha256
FROM r WHERE rn = 1 AND action = 'index'
""",
        "embedding_dups": f"""
WITH planes AS (SELECT p, {_plane_sql("p")} AS pv
                FROM range(0, {EMB_DUP_BANDS * EMB_DUP_BAND_BITS}) t(p)),
bits AS (
  SELECT vec_id, p // {EMB_DUP_BAND_BITS} AS band, p,
         CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings, planes
),
buckets AS (SELECT vec_id, band, string_agg(bit, '' ORDER BY p) AS bucket
            FROM bits GROUP BY vec_id, band),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT vec_a, vec_b,
    floor((list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[])) *
       sqrt(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[]))))
      * 1000000 + 0.5) / 1000000.0 AS cosine
  FROM cand JOIN embeddings ea ON ea.vec_id = vec_a
            JOIN embeddings eb ON eb.vec_id = vec_b
)
SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {EMB_DUP_THRESHOLD}
""",
        "ivf_topk": f"""
WITH cents AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id < {IVF_CELLS}),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
qcells AS (
  SELECT cid FROM cents, q
  ORDER BY (list_dot_product(cv, qv) /
            (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv)))) DESC,
           cid ASC
  LIMIT {IVF_PROBE}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cid AS cell,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        (list_dot_product(e.embedding::DOUBLE[], c.cv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
          sqrt(list_dot_product(c.cv, c.cv)))) DESC, c.cid ASC) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
cand AS (SELECT vec_id FROM assign WHERE cell IN (SELECT cid FROM qcells))
SELECT e.vec_id,
  floor((list_dot_product(e.embedding::DOUBLE[], qv) /
    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
     sqrt(list_dot_product(qv, qv)))) * 1000000 + 0.5) / 1000000.0 AS cosine
FROM embeddings e JOIN cand USING (vec_id), q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
        "media_frames": """
SELECT doc_id AS media_id, CAST(r.frame_idx AS INT) AS frame_idx,
       md5(text || ':' || CAST(r.frame_idx AS VARCHAR)) AS frame_md5
FROM documents,
     unnest(range(0, least(8, greatest(1, ((doc_id % 10 + 1) * 900) // 1000))))
     AS r(frame_idx)
""",
        "ann_lsh_topk": f"""
WITH planes AS (SELECT p, {_plane_sql("p")} AS pv FROM range(0, {ANN_PLANES}) t(p)),
bits AS (
  SELECT vec_id, p,
         CASE WHEN list_dot_product(embedding::DOUBLE[], pv) >= 0
              THEN '1' ELSE '0' END AS bit
  FROM embeddings, planes
),
buckets AS (SELECT vec_id, string_agg(bit, '' ORDER BY p) AS bucket
            FROM bits GROUP BY vec_id),
q AS (SELECT b.bucket AS qb, e.embedding::DOUBLE[] AS qv
      FROM buckets b JOIN embeddings e USING (vec_id) WHERE b.vec_id = 0),
cand AS (
  SELECT vec_id FROM buckets, q
  WHERE len(list_filter(range(1, {ANN_PLANES + 1}),
            i -> substr(bucket, i, 1) <> substr(qb, i, 1))) <= {ANN_MAX_HAMMING}
)
SELECT e.vec_id,
  floor((list_dot_product(e.embedding::DOUBLE[], qv) /
    (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
     sqrt(list_dot_product(qv, qv)))) * 1000000 + 0.5) / 1000000.0 AS cosine
FROM embeddings e JOIN cand USING (vec_id), q
ORDER BY cosine DESC, vec_id ASC LIMIT 10
""",
        "simhash": f"""
WITH toks AS (SELECT doc_id AS id, {_TOKS_SQL} AS tokens FROM documents),
tf AS (SELECT id, t.term, count(*)::BIGINT AS tf FROM toks,
       unnest(tokens) AS t(term) GROUP BY id, t.term),
h AS (SELECT id, tf, {_HEX_HI.format(h="md5(term)")} AS hi,
             {_HEX_LO.format(h="md5(term)")} AS lo FROM tf),
votes AS (
  SELECT id, b.b AS b,
    sum(CASE WHEN ((CASE WHEN b.b >= 32 THEN hi >> (b.b - 32)
                         ELSE lo >> b.b END) & 1) = 1
             THEN tf ELSE -tf END) AS v
  FROM h, range(0, 64) b(b) GROUP BY id, b.b
),
sig AS (
  SELECT id, CAST(sum(CASE WHEN v > 0 THEN
      CASE WHEN b = 63 THEN -9223372036854775807 - 1
           ELSE (1::BIGINT << b) END ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY id
)
SELECT d.doc_id AS id, COALESCE(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN sig s ON s.id = d.doc_id
""",
        "fingerprint": f"""
WITH toks AS (SELECT doc_id, {_TOKS_SQL} AS tokens FROM documents),
mh AS (SELECT doc_id,
  CASE WHEN len(tokens) = 0 THEN NULL
       WHEN len(tokens) <= 8 THEN substr(md5(array_to_string(tokens,' ')),1,16)
       ELSE list_min(list_transform(range(1, len(tokens) - 6),
              i -> substr(md5(array_to_string(list_slice(tokens, i, i + 7), ' ')),1,16)))
  END AS h FROM toks),
parts AS (SELECT doc_id, {_HEX_HI.format(h="h")} AS hi,
                 {_HEX_LO.format(h="h")} AS lo FROM mh WHERE h IS NOT NULL)
SELECT m.doc_id,
  COALESCE((p.hi - CASE WHEN p.hi >= 2147483648 THEN 4294967296 ELSE 0 END)
           * 4294967296 + p.lo, 0) AS fingerprint
FROM mh m LEFT JOIN parts p USING (doc_id)
""",
    }
    # delta_apply: the physical write path (delta segments + tombstones)
    # differs from stream_apply's shard rebuild, the STATE CONTRACT does
    # not — both fold the whole stream, newest action per key
    sqls["delta_apply"] = sqls["stream_apply"]
    return sqls
