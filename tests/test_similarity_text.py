"""Similarity search + text analysis on driver tables."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.operators.similarity import (
    brute_force_topk,
    lsh_buckets,
    lsh_topk,
)
from go_dcp_elasticsearch_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = {
        vid: float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))) for vid, v in vecs.items()
    }
    want = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]
    got = [
        (r["vec_id"], r["cosine"])
        for r in brute_force_topk(emb, q.tolist(), k=10).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gv, gc), (wv, wc) in zip(got, want):
        assert abs(gc - wc) < 2e-6


def test_lsh_recall_on_near_duplicates(spark, sf_dir):
    """LSH ANN is built for HIGH-similarity retrieval (near-dup mining,
    cos >= ~0.9); the driver embeddings are near-random (top cos ~0.3),
    where sign-LSH provably has little locality. Plant 15 near-copies of
    the query (true use case) and require recall >= 0.8 on them."""
    rng = np.random.RandomState(1)
    emb = _emb(spark, sf_dir)
    q = np.array(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"], dtype=np.float64
    )
    planted = [
        (10_000 + i, (q + rng.normal(scale=0.08, size=len(q))).tolist(), -1)
        for i in range(15)
    ]
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>, label int")
    )
    exact = {r["vec_id"] for r in brute_force_topk(aug, q.tolist(), k=15).collect()}
    approx = {
        r["vec_id"]
        for r in lsh_topk(aug, q.tolist(), k=15, n_planes=8, dim=len(q)).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall too low on near-dups: {recall}"


def test_lsh_buckets_deterministic(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    b1 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, n_planes=8, dim=64).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb, n_planes=8, dim=64).collect()}
    assert b1 == b2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in b1.values())


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [(1, "two words"), (2, ""), (3, "   "), (4, "camelCase splitter_x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_words"]) for r in token_count(df, "text", "doc_id").collect()}
    assert got[1] == (2, 2)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    assert got[4] == (4, 2)  # camel+snake split to 4 canonical tokens


def test_quality_score_ranges(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = quality_score(docs, "text", "doc_id").collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is here"),
            (2, "el perro de la casa que los gatos"),
            (3, "der hund und die katze das ist gut"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "es", 3: "de"}


def test_fingerprint_properties(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "totally different words everywhere in this one document here now"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert got[1] == got[2]  # deterministic
    assert got[1] != got[3]
    assert got[4] == 0


def test_ivf_recall_on_near_duplicates(spark, sf_dir):
    """IVF-flat: planted near-copies of the query must land in the probed
    cells (their cosine to the query's cell centroid is ~the query's) —
    recall >= 0.8 at n_probe=4/16."""
    from go_dcp_elasticsearch_spark.operators.similarity import ivf_topk

    rng = np.random.RandomState(1)
    emb = _emb(spark, sf_dir)
    q = np.array(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"], dtype=np.float64
    )
    planted = [
        (10_000 + i, (q + rng.normal(scale=0.08, size=len(q))).tolist(), -1)
        for i in range(15)
    ]
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>, label int")
    )
    exact = {r["vec_id"] for r in brute_force_topk(aug, q.tolist(), k=15).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(aug, q.tolist(), k=15, n_cells=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low on near-dups: {recall}"


def test_trained_ivf_codebook(spark, sf_dir):
    """Deterministic k-means quantizer: (a) bit-identical across retrains
    (md5-seeded init, fixed iterations, no RNG); (b) at the SAME probe
    budget, recall@15 vs brute force on the planted-near-dup fixture is
    >= the naive lowest-id quantizer's and >= 0.8."""
    from go_dcp_elasticsearch_spark.operators.similarity import (
        ivf_topk,
        train_ivf_codebook,
    )

    rng = np.random.RandomState(1)
    emb = _emb(spark, sf_dir)
    q = np.array(
        emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"], dtype=np.float64
    )
    planted = [
        (10_000 + i, (q + rng.normal(scale=0.08, size=len(q))).tolist(), -1)
        for i in range(15)
    ]
    aug = emb.unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<double>, label int")
    )
    cb1 = train_ivf_codebook(aug, n_cells=16, n_iters=4, seed=7)
    cb2 = train_ivf_codebook(aug, n_cells=16, n_iters=4, seed=7)
    assert cb1 == cb2, "k-means retrain is not deterministic"
    assert len(cb1) == 16 and all(len(v) == len(q) for _, v in cb1)

    exact = {r["vec_id"] for r in brute_force_topk(aug, q.tolist(), k=15).collect()}

    def recall(centroids):
        got = {
            r["vec_id"]
            for r in ivf_topk(
                aug, q.tolist(), k=15, n_cells=16, n_probe=4, centroids=centroids
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_trained = recall(cb1)
    r_naive = recall(None)
    assert r_trained >= 0.8, f"trained IVF recall {r_trained}"
    assert r_trained >= r_naive - 1e-9, (r_trained, r_naive)
