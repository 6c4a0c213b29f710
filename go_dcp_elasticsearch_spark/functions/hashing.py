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
