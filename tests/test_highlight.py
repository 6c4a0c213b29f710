"""ES ``highlight`` analogue (BM25Query.highlight): deterministic
token-stream fragments around query-term matches, matched terms wrapped,
non-overlapping first-match-first fragments, sha-enforced source join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index import BM25Query, IndexBuilder

Q = "buffer value"


def _py_fragments(toks, terms, w, mf, pre="<em>", post="</em>"):
    frags, prev_end = [], -1
    for i, t in enumerate(toks):
        if len(frags) >= mf:
            break
        if t not in terms or i <= prev_end:
            continue
        lo, hi = max(0, i - w), min(len(toks), i + w + 1)
        frags.append(" ".join((pre + tk + post) if tk in terms else tk
                              for tk in toks[lo:hi]))
        prev_end = hi - 1
    return frags


@pytest.fixture(scope="module")
def hl_idx(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("hlidx") / "idx")
    corpus = synth_corpus(spark, 200)
    IndexBuilder(spark, idx, n_shards=3).build(corpus)
    docs = spark.read.parquet(f"{idx}/docs").select(
        "doc_id", "repo", "path"
    ).collect()
    src = {(r["repo"], r["path"]): r["content"] for r in corpus.collect()}
    toks = {r["doc_id"]: tokenize_py(src[(r["repo"], r["path"])]) for r in docs}
    return idx, corpus, toks


@pytest.mark.parametrize("w,mf", [(5, 1), (2, 3), (0, 2)])
def test_highlight_matches_python_rule(spark, hl_idx, w, mf):
    idx, corpus, toks = hl_idx
    q = BM25Query(spark, idx)
    hits = q.topk_pruned(Q, 10)
    got = {
        int(r["doc_id"]): list(r["fragments"])
        for r in q.highlight(hits, Q, corpus, window=w,
                             max_fragments=mf).collect()
    }
    terms = set(tokenize_py(Q))
    assert len(got) == 10
    for d, frags in got.items():
        assert frags == _py_fragments(toks[d], terms, w, mf), (d, w, mf)
        assert frags, "top-k hits must produce at least one fragment"


def test_highlight_no_match_empty_and_custom_tags(spark, hl_idx):
    idx, corpus, toks = hl_idx
    q = BM25Query(spark, idx)
    # hand-made hits frame including docs that do NOT contain the term
    non = [d for d, t in toks.items() if "buffer" not in set(t)][:3]
    has = [d for d, t in toks.items() if "buffer" in set(t)][:3]
    hits = spark.createDataFrame(
        [(d, 1.0) for d in non + has], "doc_id long, score double"
    )
    got = {
        int(r["doc_id"]): list(r["fragments"])
        for r in q.highlight(hits, "buffer", corpus, window=1,
                             pre_tag="[", post_tag="]").collect()
    }
    for d in non:
        assert got[d] == []
    for d in has:
        assert got[d] and all("[buffer]" in f for f in got[d])


def test_highlight_sha_mismatch_raises(spark, hl_idx):
    idx, corpus, _ = hl_idx
    q = BM25Query(spark, idx)
    hits = q.topk_pruned(Q, 3)
    tampered = corpus.withColumn(
        "content", F.concat(F.col("content"), F.lit(" tampered"))
    )
    with pytest.raises(Exception, match="sha256 mismatch"):
        q.highlight(hits, Q, tampered).collect()


def test_highlight_validation(spark, hl_idx):
    idx, corpus, _ = hl_idx
    q = BM25Query(spark, idx)
    hits = q.topk_pruned(Q, 3)
    with pytest.raises(ValueError, match="source corpus frame"):
        q.highlight(hits, Q, None)
    with pytest.raises(ValueError, match="window"):
        q.highlight(hits, Q, corpus, window=-1)
    with pytest.raises(ValueError, match="window"):
        q.highlight(hits, Q, corpus, max_fragments=0)
    with pytest.raises(ValueError, match="no tokens"):
        q.highlight(hits, "!!!", corpus)
