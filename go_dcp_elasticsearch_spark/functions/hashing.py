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
