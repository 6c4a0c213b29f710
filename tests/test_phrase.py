"""Phrase retrieval (ES match_phrase analogue; the searchable-surface
capability family of SURVEY.md Table B, alongside B9/B10).

The engine has no positional postings (documented trade): candidates come
from the conjunctive posting intersection, the phrase test re-tokenizes
ONLY candidate docs' content from the caller-passed source table, and the
north-star content_sha256 invariant is enforced on every candidate row.
Rank identity is asserted against the pure-Python bm25_phrase_oracle
(same corpus-wide stats as the disjunctive oracle, filtered to
consecutive-subsequence matches)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.bm25 import (
    bm25_phrase_oracle,
    phrase_match_py,
)
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder
from go_dcp_elasticsearch_spark.index.builder import (
    assign_doc_ids,
    dedup_last_write_wins,
)

N = 400


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phridx"))
    corpus = synth_corpus(spark, N)
    IndexBuilder(spark, d, n_shards=4).build(corpus)
    rows = (
        assign_doc_ids(dedup_last_write_wins(corpus))
        .select("doc_id", "content")
        .collect()
    )
    docs_tokens = {int(r["doc_id"]): tokenize_py(r["content"]) for r in rows}
    return d, corpus, docs_tokens


def _pick_phrase(docs_tokens: dict[int, list[str]], length: int) -> list[str]:
    """A phrase that actually occurs (taken from some doc's token stream)
    and is DISCRIMINATIVE: fewer docs match the phrase than match the
    conjunction of its terms, so the verify step provably filters."""
    for toks in docs_tokens.values():
        for i in range(0, max(len(toks) - length, 0)):
            phrase = toks[i : i + length]
            if len(set(phrase)) != length:
                continue  # want distinct tokens for the main case
            n_phrase = sum(
                1 for t in docs_tokens.values() if phrase_match_py(t, phrase)
            )
            n_conj = sum(
                1 for t in docs_tokens.values() if set(phrase) <= set(t)
            )
            if 0 < n_phrase < n_conj:
                return phrase
    raise AssertionError("no discriminative phrase in fixture corpus")


@pytest.mark.parametrize("length", [2, 3])
def test_phrase_rank_identity(spark, built, length):
    index_dir, corpus, docs_tokens = built
    phrase = _pick_phrase(docs_tokens, length)
    q = BM25Query(spark, index_dir)
    want = bm25_phrase_oracle(docs_tokens, phrase, 10)
    assert want, phrase
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in q.topk_phrase(" ".join(phrase), 10, source=corpus).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want], phrase
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, (phrase, gd)
    # the phrase filter did real work: strictly fewer phrase matches than
    # conjunctive matches for this phrase (guaranteed by _pick_phrase)
    n_conj = q.topk_exact(" ".join(phrase), N, mode="all").count()
    n_phrase = q.topk_phrase(" ".join(phrase), N, source=corpus).count()
    assert 0 < n_phrase < n_conj


def test_phrase_duplicate_token(spark, built):
    """A phrase with a repeated token must require the CONSECUTIVE repeat,
    not just tf >= 2."""
    index_dir, corpus, docs_tokens = built
    tok = next(
        t
        for toks in docs_tokens.values()
        for a, t in zip(toks, toks[1:])
        if a == t
    )
    phrase = [tok, tok]
    q = BM25Query(spark, index_dir)
    want = bm25_phrase_oracle(docs_tokens, phrase, 10)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in q.topk_phrase(f"{tok} {tok}", 10, source=corpus).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    # some doc has tf >= 2 without adjacency OR fewer phrase than term
    # matches — i.e. adjacency genuinely restricts
    n_any = q.topk_exact(tok, N).count()
    assert q.topk_phrase(f"{tok} {tok}", N, source=corpus).count() < n_any


def test_phrase_edge_cases(spark, built):
    index_dir, corpus, _ = built
    q = BM25Query(spark, index_dir)
    assert q.topk_phrase("", 5, source=corpus).count() == 0
    assert q.topk_phrase("!!! ---", 5, source=corpus).count() == 0
    assert q.topk_phrase("zzznotaterm table", 5, source=corpus).count() == 0
    with pytest.raises(ValueError, match="source corpus"):
        q.topk_phrase("table scan", 5)


def test_phrase_sha_invariant_enforced(spark, built):
    """A source row whose content diverged from the indexed sha256 must
    raise, not silently mis-verify (north-star per-row invariant)."""
    index_dir, corpus, docs_tokens = built
    phrase = _pick_phrase(docs_tokens, 2)
    tampered = dedup_last_write_wins(corpus).withColumn(
        "content", F.concat(F.col("content"), F.lit(" tampered"))
    )
    q = BM25Query(spark, index_dir)
    with pytest.raises(Exception, match="sha256 mismatch"):
        q.topk_phrase(" ".join(phrase), 5, source=tampered).collect()


def test_phrase_composes_with_delta_segments(spark, tmp_path):
    """An update applied via the delta-segment path becomes phrase-
    searchable (new tokens), and a deleted doc stops matching — without a
    fold; source = the post-change corpus state."""
    from go_dcp_elasticsearch_spark.sources.changes import (
        apply_changes_to_index,
    )

    idx = str(tmp_path / "idx")
    corpus = synth_corpus(spark, 120)
    IndexBuilder(spark, idx, n_shards=2).build(corpus)
    state = dedup_last_write_wins(corpus)
    victims = [r["path"] for r in state.orderBy("repo", "path").limit(2).collect()]
    upd, dele = victims[0], victims[1]
    new_state = state.withColumn(
        "content",
        F.when(
            F.col("path") == upd,
            F.concat(F.col("content"), F.lit(" zzphrase alpha beta")),
        ).otherwise(F.col("content")),
    ).filter(F.col("path") != dele)
    changes = state.filter(F.col("path").isin([upd, dele])).select(
        "repo",
        "path",
        F.when(F.col("path") == dele, "delete").otherwise("index").alias("action"),
        (F.col("seq_no") + F.lit(10_000_000)).cast("long").alias("seq_no"),
    )
    out = apply_changes_to_index(spark, idx, new_state, changes, strategy="delta")
    if out.get("strategy") != "delta":
        raise AssertionError(f"expected delta apply, got {out}")
    q = BM25Query(spark, idx)
    hits = q.topk_phrase("zzphrase alpha beta", 5, source=new_state).collect()
    assert len(hits) == 1
    # the deleted doc never verifies (tombstoned before the verify join)
    got_paths = {
        r["path"]
        for r in q.with_meta(
            q.topk_phrase("zzphrase alpha beta", 5, source=new_state)
        ).collect()
    }
    assert got_paths == {upd}


# ---------- prefix retrieval (ES prefix query, scoring rewrite) ----------


def test_prefix_rank_identity(spark, built):
    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_prefix_oracle

    index_dir, corpus, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    # a prefix with >= 3 expansions from the fixture's own vocabulary, so
    # the cap (below) provably truncates
    pfx = next(
        p for p in (t[0] for t in vocab)
        if sum(1 for t in vocab if t.startswith(p)) >= 3
    )
    two = next(t[:2] for t in vocab if len(t) >= 2)
    for prefix, cap in [(pfx, 2), (pfx, 50), (two, 10)]:
        want = bm25_prefix_oracle(docs_tokens, prefix, cap, 10)
        assert want, (prefix, cap)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in q.topk_prefix(prefix, 10, max_expansions=cap).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], (prefix, cap)
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, (prefix, cap, gd)
        exact = [
            int(r["doc_id"])
            for r in q.topk_prefix(
                prefix, 10, max_expansions=cap, strategy="exact"
            ).collect()
        ]
        assert exact == [g[0] for g in got]


def test_prefix_expansion_semantics(spark, built):
    index_dir, _, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    pfx = next(
        p for p in (t[0] for t in vocab)
        if sum(1 for t in vocab if t.startswith(p)) >= 3
    )
    p_terms = [t for t in vocab if t.startswith(pfx)]
    assert q.expand_prefix(pfx, 50) == p_terms
    assert q.expand_prefix(pfx, 2) == p_terms[:2]  # lexicographic first-N
    assert q.expand_prefix("zzznope", 50) == []
    assert q.topk_prefix("zzznope", 5).count() == 0
    with pytest.raises(ValueError, match="one token"):
        q.expand_prefix("two words")


# ---------------------------------------------------------------------------
# fuzzy retrieval (ES fuzzy query, closest-first scoring rewrite)
# ---------------------------------------------------------------------------


def test_fuzzy_rank_identity(spark, built):
    from go_dcp_elasticsearch_spark.functions.bm25 import (
        bm25_fuzzy_oracle,
        levenshtein_py,
    )

    index_dir, _, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    # a query term whose edit-1 neighborhood (excluding itself) is
    # non-empty, so the fuzzy match genuinely expands
    term = next(
        t for t in vocab
        if sum(1 for v in vocab if v != t and levenshtein_py(v, t) <= 1) >= 1
    )
    for max_edits, pfx_len, cap in [(1, 0, 50), (2, 0, 3), (2, 1, 50)]:
        want = bm25_fuzzy_oracle(docs_tokens, term, max_edits, pfx_len, cap, 10)
        assert want, (term, max_edits)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in q.topk_fuzzy(
                term, 10, max_edits=max_edits, prefix_length=pfx_len,
                max_expansions=cap,
            ).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], (term, max_edits)
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, (term, max_edits, gd)
        exact = [
            int(r["doc_id"])
            for r in q.topk_fuzzy(
                term, 10, max_edits=max_edits, prefix_length=pfx_len,
                max_expansions=cap, strategy="exact",
            ).collect()
        ]
        assert exact == [g[0] for g in got]


def test_fuzzy_expansion_semantics(spark, built):
    from go_dcp_elasticsearch_spark.functions.bm25 import levenshtein_py

    index_dir, _, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    term = vocab[len(vocab) // 2]
    # closest-first (distance, term) order, deterministic truncation
    exp = sorted(
        (levenshtein_py(v, term), v) for v in vocab
        if levenshtein_py(v, term) <= 2
    )
    want = [t for _, t in exp]
    assert q.expand_fuzzy(term, max_edits=2, max_expansions=500) == want
    assert q.expand_fuzzy(term, max_edits=2, max_expansions=2) == want[:2]
    # the exact term itself is distance 0 and always first
    assert q.expand_fuzzy(term, max_edits=0) == [term]
    assert q.expand_fuzzy("zzzzzzzznope", max_edits=1) == []
    assert q.topk_fuzzy("zzzzzzzznope", 5, max_edits=1).count() == 0
    with pytest.raises(ValueError, match="one token"):
        q.expand_fuzzy("two words")
    with pytest.raises(ValueError, match=">= 0"):
        q.expand_fuzzy(term, max_edits=-1)


# ---------------------------------------------------------------------------
# wildcard retrieval (ES wildcard query, scoring rewrite)
# ---------------------------------------------------------------------------


def test_wildcard_rank_identity(spark, built):
    import fnmatch

    from go_dcp_elasticsearch_spark.functions.bm25 import bm25_wildcard_oracle

    index_dir, _, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    # pattern from the fixture's own vocabulary: first char + '*' + last
    # char of a term whose pattern matches >= 2 vocab terms
    pat = next(
        t[0] + "*" + t[-1] for t in vocab if len(t) >= 3
        and sum(1 for v in vocab if fnmatch.fnmatchcase(v, t[0] + "*" + t[-1])) >= 2
    )
    for pattern, cap in [(pat, 50), (pat, 2), ("?" + pat[0] + "*", 10)]:
        want = bm25_wildcard_oracle(docs_tokens, pattern, cap, 10)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in q.topk_wildcard(pattern, 10, max_expansions=cap).collect()
        ]
        assert [g[0] for g in got] == [w[0] for w in want], (pattern, cap)
        for (gd, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, (pattern, cap, gd)


def test_wildcard_semantics(spark, built):
    import fnmatch

    index_dir, _, docs_tokens = built
    q = BM25Query(spark, index_dir)
    vocab = sorted({t for toks in docs_tokens.values() for t in toks})
    t0 = next(t for t in vocab if len(t) >= 3)
    pat = t0[0] + "*"
    want = [t for t in vocab if fnmatch.fnmatchcase(t, pat)]
    assert q.expand_wildcard(pat, 500) == want
    assert q.expand_wildcard(pat, 2) == want[:2]  # lexicographic first-N
    # '?' is exactly-one-char: length-constrained matches only
    qpat = "?" * len(t0)
    assert q.expand_wildcard(qpat, 500) == [t for t in vocab if len(t) == len(t0)][:500]
    assert q.expand_wildcard("zz*nope", 50) == []
    assert q.topk_wildcard("zz*nope", 5).count() == 0
    with pytest.raises(ValueError, match="wildcard pattern"):
        q.expand_wildcard("bad pattern!")
    # uppercase is canonicalized like the analyzer, not rejected
    assert q.expand_wildcard(pat.upper(), 500) == want


# ---------------------------------------------------------------- phrase slop


def _span_brute(toks, seq, slop):
    """Independent span-near oracle: DFS over ALL increasing position
    tuples (not the engine's greedy-earliest), span <= len-1+slop."""
    pos = [[i for i, t in enumerate(toks) if t == w] for w in seq]
    if any(not p for p in pos):
        return False
    limit = len(seq) - 1 + slop

    def rec(k, prev, start):
        if k == len(seq):
            return True
        for p in pos[k]:
            if p > prev and p - start <= limit:
                if rec(k + 1, p, start):
                    return True
        return False

    return any(rec(1, p1, p1) for p1 in pos[0])


def _slop_phrase(docs_tokens):
    """A 2-token in-order pair that matches MORE docs at slop=1 than at
    slop=0 (so the slack provably bites) yet fewer than the conjunction."""
    for toks in docs_tokens.values():
        for i in range(len(toks) - 2):
            a, b = toks[i], toks[i + 2]
            if a == b:
                continue
            seq = [a, b]
            n0 = sum(1 for t in docs_tokens.values() if _span_brute(t, seq, 0))
            n1 = sum(1 for t in docs_tokens.values() if _span_brute(t, seq, 1))
            nc = sum(1 for t in docs_tokens.values() if set(seq) <= set(t))
            if n0 < n1 < nc:
                return seq
    raise AssertionError("no slop-discriminative pair in fixture corpus")


@pytest.mark.parametrize("slop", [1, 2])
def test_phrase_slop_rank_identity(spark, built, slop):
    """topk_phrase(slop=s) == BM25 over the phrase terms filtered by the
    independent DFS span-near oracle."""
    d, corpus, docs_tokens = built
    q = BM25Query(spark, d)
    seq = _slop_phrase(docs_tokens)
    exp = [
        (doc, round(s, 9))
        for doc, s in bm25_phrase_oracle(
            docs_tokens, seq, 10,
            match_fn=lambda t: _span_brute(t, seq, slop),
        )
    ]
    got = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in q.topk_phrase(" ".join(seq), 10, source=corpus,
                               slop=slop).collect()
    ]
    assert got == exp and got


def test_phrase_slop_monotone_and_zero_is_exact(spark, built):
    d, corpus, docs_tokens = built
    q = BM25Query(spark, d)
    seq = _slop_phrase(docs_tokens)
    text = " ".join(seq)
    ids = {}
    for s in (0, 1, 2):
        ids[s] = {int(r["doc_id"])
                  for r in q.topk_phrase(text, 400, source=corpus,
                                         slop=s).collect()}
    assert ids[0] <= ids[1] <= ids[2]
    assert ids[0] != ids[1], "fixture pair must gain matches at slop=1"
    exact = {int(r["doc_id"])
             for r in q.topk_phrase(text, 400, source=corpus).collect()}
    assert ids[0] == exact
    with pytest.raises(ValueError, match="slop must be >= 0"):
        q.topk_phrase(text, 10, source=corpus, slop=-1)
