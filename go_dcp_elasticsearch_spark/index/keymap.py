"""Key-bucketed docs-metadata cache: O(delta) key lookups for incremental
applies (round-6; the builder's stated future work in BENCH/BASELINE.md §9,
VERDICT r5 "what's missing" #2).

Problem: every delta-segment apply pays one key -> (doc_id, shard,
doc_len) lookup join over the FULL docs metadata, plus a full-metadata
aggregation for the id/shard bounds, and the auto-strategy probe adds
another full scan. Column-pruned, so it is O(index metadata), not
O(index) — but at 10^12 documents that metadata is itself tens of TB
scanned per apply. The reference gets the equivalent for free from
Elasticsearch doc-id hash routing: every bulk action is key-addressed
(bulk.go:234-249), so a lookup touches one shard, never the whole store.

Design — a CACHE with epoch validation, never an authority:

  {index}/keymap/base/_kb=B/...   (kh, key_cols..., doc_id, shard,
                                  doc_len, _km_alive, _km_seq) rows,
                                  partitioned by _kb = pmod(xxhash64(key),
                                  N_BUCKETS) and kh-sorted within files.
                                  Partition pruning on _kb is THE scale
                                  lever: a K-key delta lists/scans at most
                                  min(K, N_BUCKETS) bucket directories.
                                  kh-sorting additionally lets parquet
                                  row-group stats serve tiny (<=10 key)
                                  point lookups via the pushed In filter;
                                  larger lists are evaluated catalyst-side
                                  as a vectorized InSet (pushing big In
                                  lists to parquet builds an OR-of-Eq
                                  chain that overflows the JVM stack —
                                  see session.py).
  {index}/keymap/delta/seq=E/     one small file per apply: that apply's
                                  key changes (new alive rows; dead
                                  markers for deleted keys).
  {index}/keymap/_meta.json       {epoch, key_cols, n_buckets,
                                  max_doc_id, max_shard}.

Validity: the keymap is usable iff meta.epoch equals the index lineage
record count (the same monotonic epoch BM25Query keys its snapshot on).
Every maintenance path either keeps it valid (build writes the base;
both apply paths append their key changes; fold bumps the epoch — the
live key->metadata view is fold-invariant) or implicitly invalidates it
by committing lineage without an append (compact relabels every shard
and deletes the keymap outright). An invalid keymap is never consulted:
the next delta apply falls back to the full metadata scan and REBUILDS
the cache, so correctness never depends on cache freshness.

``max_doc_id`` may overestimate after a fold removed dead ids — safe:
the id authority's only contract is "never reuse", and the rebuild-path
apply recomputes real bounds from the docs table anyway.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.index.builder import IndexPaths

# bucket count for the base layout. Local-scale default; at cluster scale
# set ~corpus_size / 250k so a scattered delta still prunes (recorded in
# _meta.json, so readers always use the writer's value).
N_BUCKETS_DEFAULT = 16

# above this many distinct feed keys the pruned read degrades to a full
# base scan (a bulk re-ingest feed isn't a point-lookup workload, and a
# million-value isin list would bloat the plan)
MAX_KH_IN = 100_000

# fold the delta append history into the base once this many delta dirs
# have accumulated: every lookup reads EVERY delta file wholesale, so an
# unbounded history (one dir per apply, e.g. a long-running streaming
# pipeline) would make the per-apply metadata cost O(#applies-ever) —
# the same unbounded-growth class the index's own segment hard cap
# bounds. The fold is O(touched buckets), amortized O(1) dirs per apply.
DELTA_FOLD_AT = 32


def keymap_root(paths: IndexPaths) -> str:
    return f"{paths.root}/keymap"


def _meta_path(paths: IndexPaths) -> str:
    return f"{keymap_root(paths)}/_meta.json"


def _kh(key_cols: list[str]) -> F.Column:
    return F.xxhash64(*[F.col(c) for c in key_cols])


def load_meta(spark, paths: IndexPaths) -> dict | None:
    from go_dcp_elasticsearch_spark.fsutil import exists, read_file

    if not exists(spark, _meta_path(paths)):
        return None
    try:
        return json.loads(read_file(spark, _meta_path(paths)))
    except Exception:
        return None


def valid_meta(
    spark, paths: IndexPaths, key_cols: list[str], lineage_count: int
) -> dict | None:
    """The keymap meta iff it is valid for the CURRENT index epoch and
    key columns; None otherwise (callers fall back to full scans)."""
    m = load_meta(spark, paths)
    if (
        m is not None
        and int(m.get("epoch", -1)) == int(lineage_count)
        and list(m.get("key_cols", [])) == list(key_cols)
    ):
        return m
    return None


def _write_meta(spark, paths: IndexPaths, meta: dict) -> None:
    """Tmp+delete+rename meta write — a crash mid-write leaves either the
    old meta (stale epoch -> invalid -> rebuilt) or NO meta (invalid ->
    rebuilt), never a torn file. Hadoop rename refuses to clobber an
    existing destination, hence the explicit delete; the resulting
    missing-meta window is safe because absence just means invalid."""
    from go_dcp_elasticsearch_spark.fsutil import delete_dir, rename, write_file

    tmp = _meta_path(paths) + ".tmp"
    write_file(spark, tmp, json.dumps(meta), overwrite=True)
    delete_dir(spark, _meta_path(paths))
    if not rename(spark, tmp, _meta_path(paths)):
        raise RuntimeError(f"keymap: could not commit meta {tmp}")


def drop_keymap(spark, paths: IndexPaths) -> None:
    """Remove the cache entirely (compact_index: shard relabeling
    invalidates every stored placement)."""
    from go_dcp_elasticsearch_spark.fsutil import delete_dir

    delete_dir(spark, keymap_root(paths))


def rebuild_keymap(
    spark,
    paths: IndexPaths,
    key_cols: list[str],
    lineage_count: int,
    n_buckets: int = N_BUCKETS_DEFAULT,
    known_bounds: tuple[int, int] | None = None,
) -> dict:
    """Write the base layout from the LIVE docs view (one column-pruned
    metadata scan + one bucket-partitioned write) and commit a fresh
    meta. The id bound covers DEAD delta ids too (ids are never reused),
    mirroring the apply's own bounds scan.

    ``known_bounds``: (max_doc_id, max_shard) when the caller already
    knows them — a fresh build mints dense ids 0..n_docs-1 and labels
    0..n_shards-1, so its post-build rebuild skips the bounds job (r7;
    overestimates would also be safe, ids must only never be reused)."""
    from go_dcp_elasticsearch_spark.fsutil import delete_dir
    from go_dcp_elasticsearch_spark.index.segments import (
        read_delta_docs,
        read_docs,
    )

    live = read_docs(spark, paths).select(
        *key_cols, "doc_id", "shard", "doc_len"
    )
    rows = live.select(
        _kh(key_cols).alias("kh"),
        F.pmod(_kh(key_cols), F.lit(int(n_buckets))).cast("int").alias("_kb"),
        *key_cols,
        F.col("doc_id").cast("long"),
        F.col("shard").cast("int"),
        F.col("doc_len").cast("long"),
        F.lit(True).alias("_km_alive"),
        F.lit(0).cast("long").alias("_km_seq"),
    )
    root = keymap_root(paths)
    delete_dir(spark, root)
    (
        rows.repartition(int(n_buckets), F.col("_kb"))
        .sortWithinPartitions("kh")
        .write.mode("overwrite")
        .partitionBy("_kb")
        .parquet(f"{root}/base")
    )
    if known_bounds is not None:
        mi, ms = int(known_bounds[0]), int(known_bounds[1])
    else:
        # bounds over base ∪ ALL delta rows (alive + dead): the id
        # authority
        base = spark.read.parquet(paths.docs).select("doc_id", "shard")
        delta = read_delta_docs(spark, paths)
        ids_frame = (
            base if delta is None
            else base.unionByName(delta.select("doc_id", "shard"))
        )
        b = ids_frame.agg(
            F.max("doc_id").alias("mi"), F.max("shard").alias("ms")
        ).collect()[0]
        mi, ms = int(b["mi"]), int(b["ms"])
    meta = {
        "epoch": int(lineage_count),
        "key_cols": list(key_cols),
        "n_buckets": int(n_buckets),
        "max_doc_id": mi,
        "max_shard": ms,
    }
    _write_meta(spark, paths, meta)
    return meta


def lookup(
    spark, paths: IndexPaths, feed: DataFrame, key_cols: list[str], meta: dict
) -> DataFrame:
    """(key_cols..., doc_id, shard, doc_len) for the LIVE docs whose key
    appears in ``feed`` — the pruned replacement for joining the feed
    against the full docs metadata. Base read is partition-pruned to the
    feed keys' buckets and filtered by an isin on kh (<=10 values: pushed
    to parquet row-group stats; larger: catalyst-side vectorized InSet —
    never pushed, see session.py on the OR-chain stack overflow); delta
    files are read wholesale (each is one apply's key changes — tiny by
    construction). Last write per key wins by _km_seq (the lineage epoch
    at append time; the base is seq 0); a dead winner (deleted key)
    yields no row, exactly like the live-view join."""
    nb = int(meta["n_buckets"])
    cols = ["kh", *key_cols, "doc_id", "shard", "doc_len", "_km_alive", "_km_seq"]

    khs = [
        r["kh"]
        for r in feed.select(_kh(key_cols).alias("kh"))
        .distinct()
        .limit(MAX_KH_IN + 1)
        .collect()
    ]
    point = len(khs) <= MAX_KH_IN
    kh_list = [int(h) for h in khs] if point else None
    base = spark.read.parquet(f"{keymap_root(paths)}/base")
    if point:
        buckets = sorted({h % nb for h in kh_list})
        base = base.filter(F.col("_kb").isin(buckets)).filter(
            F.col("kh").isin(kh_list)
        )
    base = base.select(*cols)

    from go_dcp_elasticsearch_spark.fsutil import exists

    frames = base
    if exists(spark, f"{keymap_root(paths)}/delta"):
        deltas = spark.read.parquet(f"{keymap_root(paths)}/delta").drop("seq")
        if point:
            deltas = deltas.filter(F.col("kh").isin(kh_list))
        frames = frames.unionByName(deltas.select(*cols))
    winner = (
        frames.groupBy(*key_cols)
        .agg(
            F.max_by(
                F.struct("doc_id", "shard", "doc_len", "_km_alive"), "_km_seq"
            ).alias("_w")
        )
        .select(*key_cols, "_w.doc_id", "_w.shard", "_w.doc_len", "_w._km_alive")
        .filter(F.col("_km_alive"))
        .drop("_km_alive")
    )
    # exact key restriction: the kh filters pass hash-collision twins
    # through, and a no-filter (bulk-sized) read passes EVERY key — a
    # caller counting the result (the auto-strategy scatter probe) must
    # see exactly the feed's keys, nothing else
    return winner.join(feed.select(*key_cols).distinct(), key_cols, "left_semi")


def append_delta(
    spark,
    paths: IndexPaths,
    key_cols: list[str],
    alive: DataFrame | None,
    dead_keys: DataFrame | None,
    meta: dict,
    new_epoch: int,
    new_max_doc_id: int,
    new_max_shard: int,
) -> None:
    """Record one apply's key changes (``alive``: key_cols + doc_id +
    shard + doc_len of every surviving changed key; ``dead_keys``:
    key_cols of DELETED keys — updates need no dead marker, their new
    alive row supersedes by seq) and advance the meta epoch + id bounds.
    One small file; readers take the per-key max over _km_seq."""
    seq = int(new_epoch)
    parts = []
    if alive is not None:
        parts.append(
            alive.select(
                _kh(key_cols).alias("kh"),
                *key_cols,
                F.col("doc_id").cast("long"),
                F.col("shard").cast("int"),
                F.col("doc_len").cast("long"),
                F.lit(True).alias("_km_alive"),
                F.lit(seq).cast("long").alias("_km_seq"),
            )
        )
    if dead_keys is not None:
        parts.append(
            dead_keys.select(
                _kh(key_cols).alias("kh"),
                *key_cols,
                F.lit(None).cast("long").alias("doc_id"),
                F.lit(None).cast("int").alias("shard"),
                F.lit(None).cast("long").alias("doc_len"),
                F.lit(False).alias("_km_alive"),
                F.lit(seq).cast("long").alias("_km_seq"),
            )
        )
    if not parts:
        rows = None
    else:
        rows = parts[0]
        for p in parts[1:]:
            rows = rows.unionByName(p)
    if rows is not None:
        rows.coalesce(1).write.mode("overwrite").parquet(
            f"{keymap_root(paths)}/delta/seq={seq}"
        )
    new_meta = {
        **meta,
        "epoch": int(new_epoch),
        "max_doc_id": int(new_max_doc_id),
        "max_shard": int(new_max_shard),
    }
    _write_meta(spark, paths, new_meta)
    if _count_delta_dirs(spark, paths) >= DELTA_FOLD_AT:
        _fold_deltas(spark, paths, key_cols, new_meta)


def _count_delta_dirs(spark, paths: IndexPaths) -> int:
    from go_dcp_elasticsearch_spark.fsutil import hadoop_fs

    fs, p = hadoop_fs(spark, f"{keymap_root(paths)}/delta")
    if not fs.exists(p):
        return 0
    return sum(
        1
        for st in fs.listStatus(p)
        if st.isDirectory() and st.getPath().getName().startswith("seq=")
    )


def _fold_deltas(spark, paths: IndexPaths, key_cols: list[str], meta: dict) -> None:
    """Merge the delta append history into the base and clear it —
    partition-pruned to the buckets the deltas' keys touch, so the cost
    scales with the folded key set, not the corpus. Crash-safe the cache
    way: the meta is DELETED first (cache invalid — readers fall back to
    the full metadata scan and the next apply rebuilds), the buckets are
    rewritten, and the meta is restored only after the delta dirs are
    gone; a crash at any point leaves an invalid cache, never a wrong
    one."""
    from go_dcp_elasticsearch_spark.fsutil import delete_dir
    from go_dcp_elasticsearch_spark.operators.dedup import last_write_wins

    root = keymap_root(paths)
    nb = int(meta["n_buckets"])
    cols = ["kh", *key_cols, "doc_id", "shard", "doc_len", "_km_alive", "_km_seq"]
    deltas = spark.read.parquet(f"{root}/delta").drop("seq").select(*cols)
    touched = sorted(
        int(r["b"])
        for r in deltas.select(
            F.pmod(F.col("kh"), F.lit(nb)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    delete_dir(spark, _meta_path(paths))  # invalid until fully folded
    if touched:
        base = (
            spark.read.parquet(f"{root}/base")
            .filter(F.col("_kb").isin(touched))
            .select(*cols)
        )
        winners = last_write_wins(
            base.unionByName(deltas), key_cols, "_km_seq"
        ).filter(F.col("_km_alive"))
        out = winners.select(
            "kh",
            *key_cols,
            F.col("doc_id").cast("long"),
            F.col("shard").cast("int"),
            F.col("doc_len").cast("long"),
            F.lit(True).alias("_km_alive"),
            F.lit(0).cast("long").alias("_km_seq"),
            F.pmod(F.col("kh"), F.lit(nb)).cast("int").alias("_kb"),
        )
        # staging hop: the merged buckets are written OUT of the base
        # tree first (Spark cannot overwrite partitions of a path it is
        # reading in the same job), then moved in with a dynamic
        # partition overwrite of exactly the buckets that receive rows
        tmp = f"{root}/_fold_tmp"
        delete_dir(spark, tmp)
        out.repartition(max(len(touched), 1), F.col("_kb")).sortWithinPartitions(
            "kh"
        ).write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        received = {
            int(r["_kb"]) for r in staged.select("_kb").distinct().collect()
        }
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            staged.write.mode("overwrite").partitionBy("_kb").parquet(
                f"{root}/base"
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # dynamic overwrite replaces only partitions that RECEIVE rows: a
        # bucket whose keys all died must be deleted explicitly
        for bkt in set(touched) - received:
            delete_dir(spark, f"{root}/base/_kb={bkt}")
        delete_dir(spark, tmp)
        spark.catalog.refreshByPath(f"{root}/base")
    delete_dir(spark, f"{root}/delta")
    _write_meta(spark, paths, meta)


def bump_epoch(spark, paths: IndexPaths, old_count: int, new_count: int) -> None:
    """fold_segments commits lineage but leaves the live key -> metadata
    view untouched — carry the keymap across it by advancing the epoch
    iff it was valid for the pre-fold count (otherwise leave it invalid;
    the next delta apply rebuilds)."""
    m = load_meta(spark, paths)
    if m is not None and int(m.get("epoch", -1)) == int(old_count):
        _write_meta(spark, paths, {**m, "epoch": int(new_count)})
