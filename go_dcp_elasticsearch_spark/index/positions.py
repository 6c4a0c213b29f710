"""Positional postings sidecar: index-only phrase retrieval.

Lucene/Elasticsearch store token positions inside the postings
(``index_options: positions``, the default for text fields) so
``match_phrase`` never touches ``_source``. Our base postings carry
(ids, tfs, dls) only — the documented round-6 trade — and phrase verify
re-tokenizes candidate content from the caller's source table. This
module adds the positional half as an OPT-IN sidecar
(``IndexBuilder(positions=True)``):

  {index}/positions/shard=N/   rows (term, first_doc_id, n_docs,
                               ids_vb, tfs_vb, pos_vb): per (term,
                               shard, input-partition) chunk —
                               delta-gap varbyte doc ids, per-doc
                               position counts (== tf), and the
                               concatenated per-doc position-gap
                               streams (first gap = absolute first
                               position, then deltas).
  {index}/positions/_meta.json  {"epoch": lineage record count at
                               write} — the freshness contract.

Freshness contract (the deliberate scope bound, stated rather than
hidden): the sidecar is derived at BUILD time and MAINTAINED by
rebuild-strategy applies (whole shards are rewritten from content, so
``rewrite_positions_for_shards`` re-derives exactly those partitions and
re-stamps the marker — the clustered-CDC path keeps index-only phrase).
Delta-segment applies and folds do NOT maintain it — their commit bumps
the lineage epoch past the sidecar's marker and ``positions_fresh``
turns False; ``topk_phrase`` without a ``source`` then raises with the
exact remediation (pass source / rebuild) instead of serving stale
positions, and a later rebuild apply never resurrects a stale sidecar.
A fresh build with positions=False deletes the sidecar outright.

Scale shape: the build is ONE extra column-pruned content scan (join of
the docs metadata back to the corpus on the key, positions encoded in a
vectorized Arrow kernel, one shuffle on (term, shard)); a phrase query
reads the sidecar with the phrase terms pushed into the parquet scan
(``In(term, …)``), joins the decoded per-doc position lists to the
conjunctive candidates, and verifies span-near — no source table, no
content bytes, anywhere in the plan.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from go_dcp_elasticsearch_spark.functions.codec import (
    varbyte_decode,
    varbyte_encode,
)
from go_dcp_elasticsearch_spark.functions.tokenizer import tokenize_py
from go_dcp_elasticsearch_spark.index.builder import IndexPaths

POSITIONS_SCHEMA = StructType(
    [
        StructField("term", StringType(), False),
        StructField("shard", IntegerType(), False),
        StructField("first_doc_id", LongType(), False),
        StructField("n_docs", IntegerType(), False),
        StructField("ids_vb", BinaryType(), False),
        StructField("tfs_vb", BinaryType(), False),
        StructField("pos_vb", BinaryType(), False),
    ]
)


def _positions_kernel(iterator):
    """(doc_id, shard, content) -> POSITIONS_SCHEMA chunk rows.

    Vectorized grouping: factorize the batch's token stream, lexsort by
    (term, doc, position), encode each (term, shard) group's per-doc
    position-gap streams in one varbyte pass."""
    from itertools import chain

    cols = [f.name for f in POSITIONS_SCHEMA.fields]
    for pdf in iterator:
        if not len(pdf):
            continue
        pdf = pdf.sort_values("doc_id")
        toks_per_doc = [tokenize_py(c or "") for c in pdf["content"]]
        lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                           count=len(toks_per_doc))
        total = int(lens.sum())
        if total == 0:
            continue
        all_toks = pd.Series(list(chain.from_iterable(toks_per_doc)))
        doc_row = np.repeat(np.arange(len(pdf)), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos_in_doc = np.arange(total) - np.repeat(starts, lens)
        codes, uniq_terms = pd.factorize(all_toks, sort=False)
        doc_ids = pdf["doc_id"].to_numpy()[doc_row]
        shards = pdf["shard"].to_numpy().astype(np.int32)[doc_row]
        order = np.lexsort((pos_in_doc, doc_ids, shards, codes))
        codes, doc_ids, shards, pos_in_doc = (
            codes[order], doc_ids[order], shards[order], pos_in_doc[order]
        )
        # (term, shard) group boundaries, then (doc) boundaries within
        g_change = np.empty(total, dtype=bool)
        g_change[0] = True
        g_change[1:] = (codes[1:] != codes[:-1]) | (shards[1:] != shards[:-1])
        d_change = g_change.copy()
        d_change[1:] |= doc_ids[1:] != doc_ids[:-1]
        # per-doc position gaps: absolute at each doc start, delta after
        gaps = pos_in_doc.copy()
        gaps[1:] = np.where(
            d_change[1:], pos_in_doc[1:], pos_in_doc[1:] - pos_in_doc[:-1]
        )
        g_starts = np.nonzero(g_change)[0]
        g_ends = np.append(g_starts[1:], total)
        d_idx = np.nonzero(d_change)[0]
        # r7: all three varbyte streams encoded in ONE pass each over the
        # batch, then sliced per group — the per-group encode calls were
        # the kernel's hot loop (same fix as codec.encode_blocks_grouped;
        # bytes identical: varbyte encodes values independently).
        # Every group start is also a doc start (d_change ⊇ g_change), so
        # the global per-doc diff equals the per-group diffs concatenated.
        from go_dcp_elasticsearch_spark.functions.codec import (
            varbyte_lengths,
        )

        d_group = np.searchsorted(g_starts, d_idx, side="right") - 1
        ids_doc = doc_ids[d_idx]
        tfs_doc = np.diff(np.append(d_idx, total)).astype(np.uint64)
        first_of_group = np.empty(len(d_idx), dtype=bool)
        first_of_group[0] = True
        first_of_group[1:] = d_group[1:] != d_group[:-1]
        id_gaps = ids_doc.astype(np.uint64).copy()
        if len(d_idx) > 1:
            id_gaps[1:] = np.where(
                first_of_group[1:], ids_doc[1:], ids_doc[1:] - ids_doc[:-1]
            ).astype(np.uint64)
        dg_starts = np.nonzero(first_of_group)[0]
        dg_ends = np.append(dg_starts[1:], len(d_idx))
        bufs = []
        for arr in (id_gaps, tfs_doc, gaps.astype(np.uint64)):
            cum = np.concatenate(([0], np.cumsum(varbyte_lengths(arr))))
            bufs.append((varbyte_encode(arr), cum))
        yield pd.DataFrame({
            "term": [str(t) for t in
                     np.asarray(uniq_terms)[codes[g_starts]]],
            "shard": shards[g_starts].astype(np.int32),
            "first_doc_id": ids_doc[dg_starts].astype(np.int64),
            "n_docs": (dg_ends - dg_starts).astype(np.int32),
            "ids_vb": [bufs[0][0][bufs[0][1][s]:bufs[0][1][e]]
                       for s, e in zip(dg_starts, dg_ends)],
            "tfs_vb": [bufs[1][0][bufs[1][1][s]:bufs[1][1][e]]
                       for s, e in zip(dg_starts, dg_ends)],
            "pos_vb": [bufs[2][0][bufs[2][1][s]:bufs[2][1][e]]
                       for s, e in zip(g_starts, g_ends)],
        }, columns=cols)


def build_positions(spark, index_dir: str, corpus: DataFrame) -> dict:
    """Write the positional sidecar for an already-built index: join the
    docs metadata (doc_id, key, shard) back to the corpus content (one
    column-pruned scan; LWW-deduped exactly like the build), extract
    positions in the Arrow kernel, one (term, shard) repartition, write
    shard-partitioned + term-sorted (term predicate pushdown for phrase
    reads). Stamps the freshness marker with the post-write lineage
    epoch. Returns {"n_rows", "epoch"}."""
    from go_dcp_elasticsearch_spark.fsutil import delete_dir
    from go_dcp_elasticsearch_spark.index.builder import (
        dedup_last_write_wins,
    )
    from go_dcp_elasticsearch_spark.plans.lineage import LineageLog

    paths = IndexPaths(index_dir)
    if positions_fresh(spark, paths):
        # idempotent under resume: a sidecar stamped at the CURRENT
        # epoch is already derived from this exact index state
        return {"n_rows": -1, "epoch": LineageLog(
            spark, paths.lineage
        ).record_count(), "skipped": True}
    docs_meta = spark.read.parquet(paths.docs).select(
        "doc_id", "repo", "path", "shard"
    )
    if "seq_no" in corpus.columns:
        corpus = dedup_last_write_wins(corpus)
    src = docs_meta.join(
        corpus.select("repo", "path", "content"), ["repo", "path"]
    ).select("doc_id", "shard", "content")
    n_shards = spark.read.parquet(paths.docs).select(
        F.max("shard")
    ).collect()[0][0]
    n_out = int(n_shards or 0) + 1
    chunks = src.mapInPandas(_positions_kernel, schema=POSITIONS_SCHEMA)
    delete_dir(spark, paths.positions)
    (
        chunks.repartition(n_out, F.col("shard"))
        .sortWithinPartitions("term", "first_doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(paths.positions)
    )
    epoch = stamp_positions_marker(spark, paths)
    spark.catalog.refreshByPath(paths.positions)
    n_rows = spark.read.parquet(paths.positions).count()
    return {"n_rows": int(n_rows), "epoch": int(epoch)}


def rewrite_positions_for_shards(
    spark, index_dir: str | IndexPaths, shard_corpus: DataFrame,
    shards: set[int],
) -> None:
    """Rebuild-apply maintenance: replace the ``shard=N`` position
    partitions of the REBUILT shards from the (persisted) rebuild
    corpus — the same shard-scoped replace the postings get, so a
    rebuild-strategy apply keeps the sidecar exactly in sync with the
    base it just rewrote (a shard-corpus row exists for every surviving
    doc of every rebuilt shard, inserts included; emptied shards simply
    receive no rows and their partition stays deleted). The caller
    re-stamps the freshness marker AFTER its lineage commit."""
    from go_dcp_elasticsearch_spark.sources.changes import (
        _delete_shard_partitions,
    )

    paths = index_dir if isinstance(index_dir, IndexPaths) else IndexPaths(index_dir)
    chunks = shard_corpus.select("doc_id", "shard", "content").mapInPandas(
        _positions_kernel, schema=POSITIONS_SCHEMA
    )
    _delete_shard_partitions(spark, paths.positions, shards, refresh=False)
    (
        chunks.repartition(max(len(shards), 1), F.col("shard"))
        .sortWithinPartitions("term", "first_doc_id")
        .write.mode("append")
        .partitionBy("shard")
        .parquet(paths.positions)
    )
    spark.catalog.refreshByPath(paths.positions)


def stamp_positions_marker(spark, index_dir: str | IndexPaths) -> int:
    """(Re)write the freshness marker at the CURRENT lineage epoch —
    called by writers whose sidecar state matches the index they just
    committed (build, rebuild-apply maintenance)."""
    from go_dcp_elasticsearch_spark.fsutil import write_file
    from go_dcp_elasticsearch_spark.plans.lineage import LineageLog

    paths = index_dir if isinstance(index_dir, IndexPaths) else IndexPaths(index_dir)
    epoch = LineageLog(spark, paths.lineage).record_count()
    write_file(
        spark, paths.positions_meta, json.dumps({"epoch": epoch}),
        overwrite=True,
    )
    return int(epoch)


def positions_fresh(spark, index_dir: str | IndexPaths) -> bool:
    """True iff the sidecar exists and its marker epoch equals the
    CURRENT lineage record count — i.e. no maintenance op (apply, fold,
    compact) has committed since the positions were derived."""
    from go_dcp_elasticsearch_spark.fsutil import exists, read_file
    from go_dcp_elasticsearch_spark.plans.lineage import LineageLog

    paths = index_dir if isinstance(index_dir, IndexPaths) else IndexPaths(index_dir)
    if not exists(spark, paths.positions_meta):
        return False
    try:
        marker = json.loads(read_file(spark, paths.positions_meta))
    except Exception:  # noqa: BLE001 — unreadable marker = stale
        return False
    return int(marker.get("epoch", -1)) == LineageLog(
        spark, paths.lineage
    ).record_count()


def decoded_positions(spark, index_dir: str | IndexPaths, terms: list[str]) -> DataFrame:
    """Sidecar rows for ``terms`` (predicate pushed into parquet) ->
    (doc_id, term, pos array<long>) via an Arrow decode kernel."""
    paths = index_dir if isinstance(index_dir, IndexPaths) else IndexPaths(index_dir)
    rows = spark.read.parquet(paths.positions).filter(
        F.col("term").isin(sorted(set(terms)))
    ).select("term", "ids_vb", "tfs_vb", "pos_vb")

    def decode(iterator):
        for pdf in iterator:
            outs = []
            for term, ids_vb, tfs_vb, pos_vb in zip(
                pdf["term"], pdf["ids_vb"], pdf["tfs_vb"], pdf["pos_vb"]
            ):
                ids = np.cumsum(
                    varbyte_decode(bytes(ids_vb)), dtype=np.uint64
                ).astype(np.int64)
                tfs = varbyte_decode(bytes(tfs_vb)).astype(np.int64)
                gaps = varbyte_decode(bytes(pos_vb)).astype(np.int64)
                # per-doc cumsum: subtract the running total at each
                # doc's start from the global cumsum
                c = np.cumsum(gaps)
                starts = np.concatenate(([0], np.cumsum(tfs)[:-1]))
                base = np.where(starts > 0, c[starts - 1], 0)
                abs_pos = c - np.repeat(base, tfs)
                # one row per (doc, term): a doc lives in exactly one
                # build partition, so (term, doc) pairs never span rows
                pos_lists = np.split(abs_pos, np.cumsum(tfs)[:-1])
                outs.append(pd.DataFrame({
                    "doc_id": ids,
                    "term": term,
                    "pos": [p.tolist() for p in pos_lists],
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return rows.mapInPandas(
        decode, schema="doc_id long, term string, pos array<long>"
    )


def span_near_positions(pos_lists: list[np.ndarray], slop: int) -> bool:
    """In-order span-near over per-token SORTED position lists (one list
    per phrase token, in phrase order): exists p_1 < … < p_n with
    p_n - p_1 <= n-1+slop? Greedy earliest completion per start is
    exact (for a fixed p_1 it minimizes p_n)."""
    n = len(pos_lists)
    if any(len(p) == 0 for p in pos_lists):
        return False
    limit = n - 1 + slop
    for p1 in pos_lists[0]:
        pos = int(p1)
        ok = True
        for arr in pos_lists[1:]:
            j = np.searchsorted(arr, pos + 1)
            if j == len(arr) or int(arr[j]) - int(p1) > limit:
                ok = False
                break
            pos = int(arr[j])
        if ok:
            return True
    return False
