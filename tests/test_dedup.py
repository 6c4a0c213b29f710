"""Dedup family: each operator checked against a pure-Python oracle."""

from __future__ import annotations

import hashlib
from collections import Counter

from go_dcp_elasticsearch_spark.functions.hashing import (
    hamming64,
    simhash64_py,
)
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.operators.dedup import (
    exact_dedup,
    minhash_band_buckets,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash64,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat today"),  # near dup
    (3, "completely different content about sparkSQL engines and queryPlans"),
    (4, "short"),
    (5, ""),
    (6, "the quick brown fox jumps over the lazy dog yesterday evening"),  # near dup
]


def _shingles(text, n=3):
    toks = tokenize_py(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_oracle(spark):
    got = {
        r["content_hash"]: (r["keep_id"], r["n_dups"])
        for r in exact_dedup(_df(spark), "text", "doc_id").collect()
    }
    want = {}
    for did, text in DOCS:
        h = hashlib.md5(text.encode()).hexdigest()
        if h in want:
            want[h] = (min(want[h][0], did), want[h][1] + 1)
        else:
            want[h] = (did, 1)
    assert got == want
    assert got[hashlib.md5(DOCS[0][1].encode()).hexdigest()] == (0, 2)


def test_minhash_oracle(spark):
    """Spark minhash signatures == python md5 oracle; exact dups must
    collide in every band; disjoint docs must not pair."""
    n_hashes, band = 6, 3
    buckets = minhash_band_buckets(_df(spark), "text", "doc_id", n_hashes, band).collect()
    got = {(r["id"], r["band"]): r["bucket"] for r in buckets}

    def sig(text, i):
        sh = _shingles(text)
        return min(hashlib.md5(s.encode()).hexdigest()[i * 5 : i * 5 + 5] for s in sh)

    for did, text in DOCS:
        if len(_shingles(text)) == 0:
            assert not any(k[0] == did for k in got)
            continue
        for b in range(n_hashes // band):
            sigs = [sig(text, b * band + j) for j in range(band)]
            want = hashlib.md5("|".join(sigs).encode()).hexdigest()
            assert got[(did, b)] == want, (did, b)

    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs(
            minhash_band_buckets(_df(spark), "text", "doc_id", n_hashes, band)
        ).collect()
    }
    assert (0, 1) in pairs  # exact dup -> all bands collide
    assert not any(3 in p for p in pairs)  # disjoint doc never pairs


def test_ngram_jaccard_oracle(spark):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_df(spark), "text", "doc_id", 3, 0.3).collect()
    }
    want = {}
    for i, (ida, ta) in enumerate(DOCS):
        for idb, tb in DOCS[i + 1 :]:
            sa, sb = _shingles(ta), _shingles(tb)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.3:
                want[(ida, idb)] = round(j, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, k
    assert got[(0, 1)] == 1.0


def test_simhash_oracle_and_hamming(spark):
    got = {r["id"]: r["simhash"] for r in simhash64(_df(spark), "text", "doc_id").collect()}
    for did, text in DOCS:
        assert got[did] == simhash64_py(tokenize_py(text)), did
    # near dups closer than unrelated docs
    d_near = hamming64(got[0], got[2])
    d_far = hamming64(got[0], got[3])
    assert got[0] == got[1]
    assert d_near < d_far


def test_simhash_tf_weighting():
    # repeated token dominates the signature
    a = simhash64_py(["alpha"] * 50 + ["beta"])
    b = simhash64_py(["alpha"])
    assert hamming64(a, b) <= 8


def test_embedding_dups_lsh_subset_of_exact(spark, sf_dir):
    """The bucketed path returns a SUBSET of the exact O(n^2) pairs (same
    cosines, no false positives); on the fixture the candidate generation
    is checked bit-exact by the driver oracle."""
    from go_dcp_elasticsearch_spark.operators.dedup import embedding_cosine_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_dups(
            emb, "embedding", "vec_id", threshold=0.3, method="exact"
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_dups(
            emb, "embedding", "vec_id", threshold=0.3, method="lsh", dim=64
        ).collect()
    }
    assert lsh, "lsh path returned nothing"
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-9


def test_minhash_hot_bucket_cap(spark):
    """max_bucket_size drops degenerate buckets: m identical docs would
    emit m^2 candidate rows; with the cap the bucket is skipped."""
    import pandas as pd

    from go_dcp_elasticsearch_spark.operators.dedup import minhash_candidate_pairs

    rows = [(i, 0, "samebucket") for i in range(20)] + [(100, 1, "b2"), (101, 1, "b2")]
    buckets = spark.createDataFrame(rows, "id long, band int, bucket string")
    uncapped = minhash_candidate_pairs(buckets).count()
    capped = minhash_candidate_pairs(buckets, max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert uncapped == 190 + 1
    assert got == {(100, 101)}


def test_minhash_md5_extended_hashes(spark):
    """n_hashes > 6 in md5 mode: slices 0-5 come from md5(s), 6-11 from
    md5('1|'+s) — checked against a pure-Python oracle; first-6 behavior
    stays byte-identical to the single-digest scheme."""
    n_hashes, band = 12, 3
    got = {}
    for r in minhash_band_buckets(
        _df(spark), "text", "doc_id", n_hashes, band
    ).collect():
        got.setdefault(r["id"], {})[r["band"]] = r["bucket"]
    for did, text in DOCS:
        toks = tokenize_py(text)
        if len(toks) < 3:
            assert did not in got
            continue
        shingles = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        d0 = [hashlib.md5(s.encode()).hexdigest() for s in shingles]
        d1 = [hashlib.md5(("1|" + s).encode()).hexdigest() for s in shingles]
        mh = [
            min(d[(i % 6) * 5 : (i % 6) * 5 + 5] for d in (d0 if i < 6 else d1))
            for i in range(n_hashes)
        ]
        want = {
            b: hashlib.md5("|".join(mh[b * band : (b + 1) * band]).encode()).hexdigest()
            for b in range(n_hashes // band)
        }
        assert got[did] == want, did


def test_minhash_scale_mode_recall(spark, sf_dir):
    """scale_mode (blake2b + Kirsch-Mitzenmacher + bucket cap) recovers
    >= 0.95 of the md5-mode candidate pairs on the real fixture — the
    'config you'd run at 100 TB' is checked against the oracle config."""
    from go_dcp_elasticsearch_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "text", "doc_id").collect()
    }
    fast = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, "text", "doc_id", scale_mode=True).collect()
    }
    assert base, "md5-mode found no candidate pairs on the fixture"
    recall = len(base & fast) / len(base)
    assert recall >= 0.95, f"scale-mode recall {recall:.3f} < 0.95 ({len(base)} base pairs)"


def test_ngram_scale_mode_matches_exact(spark):
    """scale_mode hashes shingles to int64 before the join; on a fixture
    with no hot shingles (cap never binds) and no 64-bit collisions the
    jaccard output must be IDENTICAL to the raw-shingle join."""
    raw = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(_df(spark), "text", "doc_id", 3, 0.3).collect()
    }
    hashed = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            _df(spark), "text", "doc_id", 3, 0.3, scale_mode=True
        ).collect()
    }
    assert raw == hashed and raw


def test_embedding_dups_method_required(spark, sf_dir):
    """method has no default: the recall/scale trade must be explicit."""
    import pytest

    from go_dcp_elasticsearch_spark.operators.dedup import embedding_cosine_dups

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(TypeError):
        embedding_cosine_dups(emb, "embedding", "vec_id", 0.3)


def test_dedup_clusters_union_find_oracle(spark):
    """Connected components vs a pure-Python union-find on a graph with a
    4-node chain (transitive!), a 2-cycle-joined triangle, and singletons."""
    from go_dcp_elasticsearch_spark.operators.dedup import (
        dedup_clusters,
        keep_per_cluster,
    )

    edges = [(1, 2), (2, 3), (3, 4),        # chain: pairwise keep-lowest
                                            # would keep 1 AND 3 wrongly
             (10, 11), (11, 12), (10, 12),  # triangle
             (20, 21)]
    node_ids = sorted({n for e in edges for n in e} | {99, 100})
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")

    parent = {n: n for n in node_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in node_ids}

    got = {
        r["id"]: r["cluster_id"]
        for r in dedup_clusters(nodes, pairs).collect()
    }
    assert got == want
    keeps = {
        r["id"]: r["keep"]
        for r in keep_per_cluster(dedup_clusters(nodes, pairs)).collect()
    }
    assert {n for n, k in keeps.items() if k} == {1, 10, 20, 99, 100}


def test_dedup_clusters_nonconvergence_raises(spark):
    """The iteration cap raises instead of returning half-converged labels."""
    import pytest

    from go_dcp_elasticsearch_spark.operators.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(6)]
    nodes = spark.createDataFrame([(n,) for n in range(7)], "id long")
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_clusters(nodes, pairs, max_iters=2)
    assert dedup_clusters(nodes, pairs, max_iters=10).count() == 7


def test_minhash_md5_kernel_digest_cache_is_identical():
    """r7: the md5-mode signature kernel caches digest slices per unique
    shingle; the buckets must stay byte-identical to the uncached spec
    (the DuckDB oracle mirrors the original formulation)."""
    import hashlib

    from go_dcp_elasticsearch_spark.corpus import _gen_row
    from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
    from go_dcp_elasticsearch_spark.operators.dedup import (
        minhash_band_buckets,
    )

    n_hashes, band_size, shingle_n = 12, 3, 3
    salts = ["" if d == 0 else f"{d}|" for d in range(-(-n_hashes // 6))]

    def reference(text):
        toks = tokenize_py(text)
        if len(toks) < shingle_n:
            return None
        shingles = [
            " ".join(toks[i:i + shingle_n])
            for i in range(len(toks) - shingle_n + 1)
        ]
        digests = [
            [hashlib.md5((salt + s).encode()).hexdigest() for s in shingles]
            for salt in salts
        ]
        mh = [
            min(d[(i % 6) * 5:(i % 6) * 5 + 5] for d in digests[i // 6])
            for i in range(n_hashes)
        ]
        return [
            hashlib.md5(
                "|".join(mh[b * band_size:(b + 1) * band_size]).encode()
            ).hexdigest()
            for b in range(n_hashes // band_size)
        ]

    import pandas as pd

    texts = [_gen_row(i, 5000)[4] for i in range(300)] + ["a b", ""]
    # reach the inner pandas kernel through the public factory
    import inspect

    frame = inspect.currentframe()  # noqa: F841 — keep flake quiet
    # rebuild the kernel closure exactly as minhash_band_buckets does:
    # call the operator on a tiny local Spark-free path is not possible,
    # so exercise the closure via the module-level function with a stub
    from unittest import mock

    captured = {}

    def fake_pandas_udf(fn, rt):
        captured["fn"] = fn
        return mock.MagicMock()

    with mock.patch(
        "go_dcp_elasticsearch_spark.operators.dedup.F.pandas_udf",
        side_effect=fake_pandas_udf,
    ):
        df = mock.MagicMock()
        try:
            minhash_band_buckets(df, "t", "i", n_hashes, band_size, shingle_n)
        except Exception:
            pass  # the DataFrame plumbing is mocked; we only need the kernel
    kern = captured["fn"]
    got = kern(pd.Series(texts)).tolist()
    want = [reference(t) for t in texts]
    assert got == want
