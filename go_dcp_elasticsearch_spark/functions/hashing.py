"""Deterministic hashing helpers: simhash, rolling fingerprint.

md5-based so signatures are reproducible across engines and runs (no
process-seeded hash()); vectorized callers batch via pandas UDFs.
"""

from __future__ import annotations

import hashlib
from collections import Counter


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def simhash64_py(tokens: list[str]) -> int:
    """Classic SimHash: tf-weighted bit votes over 64-bit token fingerprints.

    Returns a SIGNED 64-bit int (Spark LongType has no unsigned variant)."""
    if not tokens:
        return 0
    votes = [0] * 64
    for tok, tf in Counter(tokens).items():
        h = _md5_64(tok)
        for b in range(64):
            votes[b] += tf if (h >> b) & 1 else -tf
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    # two's-complement into signed 64-bit
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# odd golden-ratio constant for the shingle polynomial (splitmix64 family)
_SHINGLE_POLY = 0x9E3779B97F4A7C15
# pandas keyed-hash key: pinned so signatures are identical on every
# executor and across sessions (the default would also be stable, but an
# explicit key makes the determinism contract visible)
_HASH_KEY = "0123456789123456"


def token_hashes_u64(tokens: list[str]):
    """uint64 keyed hash per token via pandas' cython-vectorized
    ``hash_array`` (fixed key -> identical on every executor). Call it
    ONCE per Arrow batch over the flattened token stream — the per-call
    overhead (object-array conversion + categorize/factorize) dominates
    on per-doc calls; one batched call amortizes it and lets categorize
    hash each distinct token once."""
    import numpy as np
    from pandas.util import hash_array

    if not len(tokens):
        return np.empty(0, dtype=np.uint64)
    return hash_array(np.asarray(tokens, dtype=object), hash_key=_HASH_KEY)


def shingle_poly_u64(th, shingle_n: int):
    """uint64 hash per n-token shingle from the tokens' hashes: an
    odd-constant polynomial over n consecutive token hashes (numpy
    slides) — shingle strings are never materialized and there are zero
    per-shingle Python calls. Requires len(th) >= shingle_n."""
    import numpy as np

    n_sh = len(th) - shingle_n + 1
    c = np.uint64(_SHINGLE_POLY)
    sh = th[:n_sh].copy()
    for j in range(1, shingle_n):
        sh = sh * c + th[j : j + n_sh]
    return sh



def rolling_fingerprint_py(tokens: list[str], window: int = 8) -> int:
    """Winnowing-style document fingerprint: min 64-bit hash over rolling
    token windows (deterministic, order-sensitive). Signed 64-bit."""
    if not tokens:
        return 0
    if len(tokens) <= window:
        h = _md5_64(" ".join(tokens))
    else:
        h = min(
            _md5_64(" ".join(tokens[i : i + window]))
            for i in range(len(tokens) - window + 1)
        )
    return h - (1 << 64) if h >= (1 << 63) else h


def partition_salts(k: int) -> list[int]:
    """Salt per partition index: ``salts[i]`` satisfies
    ``pmod(murmur3_int32(salts[i]), k) == i`` — mapping each of k keys to
    its OWN partition under Spark's hash partitioner (``F.hash`` on an
    int column). Plain ``repartition(k, "shard")`` hashes k keys into k
    buckets and birthday collisions put two groups in one task (that
    straggler sets the stage's wall time); repartitioning on the probed
    salt is a PERFECT one-group-per-task partitioner. Computed locally
    with the numpy murmur3 mirror — zero Spark jobs, O(k) work.
    Shared by BM25Query._shard_salts (query-side) and the maintenance
    writers (fold/rebuild postings merges, r7)."""
    import numpy as np

    best: dict[int, int] = {}
    lo = 0
    span = 64 * k
    while len(best) < k:
        salts = np.arange(lo, lo + span, dtype=np.int64)
        p = np.mod(murmur3_int32(salts).astype(np.int64), k)
        uniq, idx = np.unique(p, return_index=True)
        for b, i in zip(uniq.tolist(), idx.tolist()):
            best.setdefault(int(b), int(salts[i]))
        lo += span
        span *= 4
    return [best[i] for i in range(k)]


def label_salt_expr(labels):
    """Column expr mapping a ``shard`` label column to its perfect-
    partitioner salt (see partition_salts): repartition(len(labels),
    label_salt_expr(labels)) gives every label its own task."""
    from pyspark.sql import functions as F

    lbls = sorted(int(s) for s in labels)
    salts = partition_salts(len(lbls))
    m = F.create_map(
        *[x for lbl, sa in zip(lbls, salts) for x in (F.lit(lbl), F.lit(sa))]
    )
    return m[F.col("shard")].cast("int")


def murmur3_int32(values, seed: int = 42):
    """Spark's ``F.hash()`` for a single INT column, vectorized in numpy.

    Spark hashes an IntegerType column with Murmur3_x86_32.hashInt(seed=42)
    (the public MurmurHash3 algorithm; Spark's variant processes the int as
    one 4-byte block and finalizes with len=4). Returns signed int32, bit-
    exact with the JVM — verified against ``F.hash`` in
    tests/test_tokenizer.py::test_murmur3_int32_matches_spark.

    Used by BM25Query._shard_salts to probe the perfect shard partitioner
    WITHOUT a Spark job: the old driver probe collected 64*n_shards rows
    per refresh, which is fine at 1k shards and real money at 100k.
    """
    import numpy as np

    v = np.asarray(values, dtype=np.int64).astype(np.uint32)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)
    with np.errstate(over="ignore"):
        k1 = (v * c1).astype(np.uint32)
        k1 = ((k1 << np.uint32(15)) | (k1 >> np.uint32(17))).astype(np.uint32)
        k1 = (k1 * c2).astype(np.uint32)
        h1 = np.uint32(seed) ^ k1
        h1 = ((h1 << np.uint32(13)) | (h1 >> np.uint32(19))).astype(np.uint32)
        h1 = (h1 * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
        # finalization: fmix(h1 ^ len), len = 4 bytes
        h1 = h1 ^ np.uint32(4)
        h1 = h1 ^ (h1 >> np.uint32(16))
        h1 = (h1 * np.uint32(0x85EBCA6B)).astype(np.uint32)
        h1 = h1 ^ (h1 >> np.uint32(13))
        h1 = (h1 * np.uint32(0xC2B2AE35)).astype(np.uint32)
        h1 = h1 ^ (h1 >> np.uint32(16))
    return h1.astype(np.int32)
