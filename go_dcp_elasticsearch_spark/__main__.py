"""spark-submit entry point.

Cluster usage (north_star deployment contract):

  # package the engine
  cd /root/repo && zip -r /tmp/engine.zip go_dcp_elasticsearch_spark

  # build an index over a corpus table
  spark-submit --py-files /tmp/engine.zip -m go_dcp_elasticsearch_spark ... # or:
  spark-submit --py-files /tmp/engine.zip /root/repo/go_dcp_elasticsearch_spark/__main__.py \
      build --corpus /data/corpus.parquet --index /data/idx --shards 1024 --id-mode input

  # query it
  spark-submit --py-files /tmp/engine.zip /root/repo/go_dcp_elasticsearch_spark/__main__.py \
      query --index /data/idx --text "parseHTTPResponse buffer" --k 10

Local smoke: PYTHONPATH=/root/repo python -m go_dcp_elasticsearch_spark build ...
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="go_dcp_elasticsearch_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index from a corpus table")
    b.add_argument("--corpus", required=True, help="parquet/iceberg path of (repo,path,commit,lang,content)")
    b.add_argument("--index", required=True, help="output index directory")
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--id-mode", choices=["sorted", "input"], default="sorted")
    b.add_argument("--field-cols", default=None,
                   help="comma-separated corpus columns indexed as keyword "
                        "fields (col:value postings, ES keyword mapping)")
    b.add_argument("--docvalue-cols", default=None,
                   help="comma-separated NUMERIC corpus columns carried "
                        "into the docs table for range queries (ES "
                        "doc_values)")
    b.add_argument("--positions", action="store_true",
                   help="write the positional sidecar (ES index_options: "
                        "positions) so phrase queries run index-only "
                        "(one extra content scan at build)")
    b.add_argument("--routing-col", default=None,
                   help="B5: place docs by hash(<col>) instead of id ranges")
    b.add_argument("--resume", action="store_true", help="skip lineage-committed stages")
    b.add_argument("--config", default=None,
                   help="engine config YAML/JSON (maxRetries -> task retry budget)")
    b.add_argument("--master", default=None)

    a = sub.add_parser("apply", help="apply a change feed to an existing index "
                                     "(incremental shard-scoped rebuild or "
                                     "delta segments)")
    a.add_argument("--index", required=True)
    a.add_argument("--corpus", required=True,
                   help="post-change corpus snapshot (parquet)")
    a.add_argument("--changes", required=True,
                   help="parquet of (repo, path, action, seq_no)")
    a.add_argument("--strategy", default="rebuild",
                   choices=("rebuild", "delta", "auto"),
                   help="rebuild: exact shard rebuild; delta: O(changed docs) "
                        "segment + tombstones (fold via `compact`); auto: "
                        "delta when the feed scatters across most shards")
    a.add_argument("--master", default=None)

    c = sub.add_parser("compact", help="merge small tail shards (metadata-only)")
    c.add_argument("--index", required=True)
    c.add_argument("--target-docs-per-shard", type=int, default=None)
    c.add_argument("--master", default=None)

    v = sub.add_parser("verify", help="per-row sha256 parity of the index's "
                                      "docs table against the source corpus")
    v.add_argument("--index", required=True)
    v.add_argument("--corpus", required=True, help="source corpus parquet")
    v.add_argument("--master", default=None)

    q = sub.add_parser("query", help="BM25 top-k query against a built index")
    q.add_argument("--index", required=True)
    q.add_argument("--text", default=None, help="single query text")
    q.add_argument("--text-file", default=None,
                   help="file with one query per line — served via topk_batch "
                        "(ONE postings scan + shared block decode for the whole set)")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--strategy", choices=["pruned", "exact"], default="pruned")
    q.add_argument("--mode",
                   choices=["any", "all", "phrase", "prefix", "bool",
                            "fuzzy", "wildcard"],
                   default="any",
                   help="any: disjunctive BM25 (default); all: every query "
                        "term must match (Elasticsearch bool.must); phrase: "
                        "consecutive token sequence (ES match_phrase — "
                        "requires --corpus, the source the index was built "
                        "from, since the index stores content_sha256, not "
                        "content); prefix: --text is a single prefix, "
                        "expanded to at most --max-expansions dictionary "
                        "terms (ES prefix query, scoring rewrite); bool: "
                        "ES bool query from --must/--should/--must-not/"
                        "--msm (--text unused); fuzzy: --text is a single "
                        "term, expanded to dictionary terms within "
                        "--max-edits (ES fuzzy, closest-first rewrite); "
                        "wildcard: --text is a */? pattern, expanded "
                        "lexicographic first-N (ES wildcard)")
    q.add_argument("--corpus", default=None,
                   help="source corpus parquet (phrase mode only)")
    q.add_argument("--max-expansions", type=int, default=50,
                   help="prefix/fuzzy/wildcard modes: expansion cap")
    q.add_argument("--max-edits", type=int, default=1,
                   help="fuzzy mode: Levenshtein distance bound")
    q.add_argument("--prefix-length", type=int, default=0,
                   help="fuzzy mode: required shared prefix length")
    q.add_argument("--must", default="",
                   help="bool mode: terms that must ALL match (scored)")
    q.add_argument("--should", default="",
                   help="bool mode: optional terms (scored; at least --msm "
                        "must match)")
    q.add_argument("--must-not", default="", dest="must_not",
                   help="bool mode: terms that must NOT match (exclusion, "
                        "never scored)")
    q.add_argument("--filter", default="",
                   help="bool mode: terms that must ALL match but never "
                        "score (ES filter context)")
    q.add_argument("--msm", type=int, default=None,
                   help="bool mode: minimum_should_match (default: 1 when "
                        "only should clauses, else 0)")
    q.add_argument("--range", default=None, dest="range_spec",
                   help="bool mode: ES range clause as JSON, e.g. "
                        "'{\"n_chars\": {\"gte\": 100, \"lt\": 500}}' — "
                        "numeric doc-value bounds (IndexBuilder "
                        "docvalue_cols; doc_len always available), filter "
                        "context (never scores)")
    q.add_argument("--slop", type=int, default=0,
                   help="phrase mode: in-order span-near slack (extra "
                        "tokens allowed inside the phrase span; 0 = exact "
                        "consecutive match)")
    q.add_argument("--highlight", action="store_true",
                   help="any/all modes: attach snippet fragments around "
                        "the matched terms (ES highlight; requires "
                        "--corpus, the source the index was built from)")
    q.add_argument("--highlight-window", type=int, default=5,
                   help="tokens each side of a match in a fragment")
    q.add_argument("--terms-filter", default=None, dest="terms_filter",
                   help="bool mode: ES terms query as JSON, e.g. "
                        "'{\"lang\": [\"en\", \"fr\"]}' — the doc must "
                        "carry at least one col:value keyword posting per "
                        "listed column (filter context, never scores)")
    q.add_argument("--after-score", type=float, default=None,
                   help="ES search_after cursor: the previous page's last "
                        "hit's score (with --after-doc; any/all modes)")
    q.add_argument("--after-doc", type=int, default=None,
                   help="ES search_after cursor: the previous page's last "
                        "hit's doc_id (with --after-score)")
    q.add_argument("--master", default=None)

    g = sub.add_parser("agg", help="ES-style aggregation over the docs "
                                   "matching a bool query (terms/stats/"
                                   "histogram)")
    g.add_argument("--index", required=True)
    g.add_argument("--agg", required=True, choices=["terms", "stats", "histogram"])
    g.add_argument("--field", required=True,
                   help="docs-table column to aggregate (keyword for terms; "
                        "numeric doc-value for stats/histogram)")
    g.add_argument("--size", type=int, default=10, help="terms: bucket cap")
    g.add_argument("--interval", type=float, default=None,
                   help="histogram: bucket width (required)")
    g.add_argument("--must", default="")
    g.add_argument("--should", default="")
    g.add_argument("--must-not", default="", dest="must_not")
    g.add_argument("--filter", default="")
    g.add_argument("--msm", type=int, default=None)
    g.add_argument("--range", default=None, dest="range_spec",
                   help="ES range clause as JSON (see query --range)")
    g.add_argument("--terms-filter", default=None, dest="terms_filter",
                   help="ES terms query as JSON (see query --terms-filter)")
    g.add_argument("--master", default=None)

    args = p.parse_args(argv)

    from go_dcp_elasticsearch_spark.session import get_spark

    def _load_corpus(spark, path: str):
        """Corpus table loader with a clear contract error instead of a
        late Spark analysis failure; the driver's documents-table shape
        (doc_id, text, lang, ...) is auto-mapped via the same shim as
        corpus.load_documents_corpus."""
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        cols = set(df.columns)
        if {"repo", "path", "content"} <= cols:
            return df
        if {"doc_id", "text"} <= cols:
            print(
                f"note: {path} is a documents-shaped table; mapping "
                "(doc_id, text, lang) -> (repo, path, commit, lang, content)",
                file=sys.stderr,
            )
            produced = {"repo", "path", "commit", "lang", "content", "seq_no"}
            extras = sorted(cols - {"doc_id", "text", "lang"} - produced)
            return df.select(
                F.lit("corpus").alias("repo"),
                F.format_string("doc/%012d", F.col("doc_id")).alias("path"),
                F.sha2(F.col("text"), 256).substr(1, 12).alias("commit"),
                (F.col("lang") if "lang" in cols else F.lit("text")).alias("lang"),
                F.col("text").alias("content"),
                F.col("doc_id").cast("long").alias("seq_no"),
                # extra metadata columns (e.g. n_chars) pass through so
                # --field-cols / --docvalue-cols can reference them
                *[F.col(c) for c in extras],
            )
        raise SystemExit(
            f"--corpus {path}: expected columns (repo, path, content[, commit, "
            f"lang, seq_no]) or the documents shape (doc_id, text, ...); "
            f"found {sorted(cols)}"
        )

    extra_conf = None
    if getattr(args, "config", None):
        from go_dcp_elasticsearch_spark.config import engine_conf, load_config

        extra_conf = engine_conf(load_config(args.config))
    spark = get_spark(
        app_name=f"ftengine-{args.cmd}", master=args.master, extra_conf=extra_conf
    )
    try:
        if args.cmd == "build":
            from go_dcp_elasticsearch_spark.index import IndexBuilder

            corpus = _load_corpus(spark, args.corpus)
            summary = IndexBuilder(
                spark, args.index, n_shards=args.shards, id_mode=args.id_mode,
                routing_col=args.routing_col,
                field_cols=(
                    args.field_cols.split(",") if args.field_cols else None
                ),
                docvalue_cols=(
                    args.docvalue_cols.split(",") if args.docvalue_cols else None
                ),
                positions=args.positions,
            ).build(corpus, resume=args.resume)
            print(json.dumps(summary))
        elif args.cmd == "apply":
            from go_dcp_elasticsearch_spark.sources.changes import apply_changes_to_index

            out = apply_changes_to_index(
                spark, args.index,
                _load_corpus(spark, args.corpus),
                spark.read.parquet(args.changes),
                strategy=args.strategy,
            )
            print(json.dumps(out))
        elif args.cmd == "verify":
            from go_dcp_elasticsearch_spark.index import verify_index_against_source

            out = verify_index_against_source(
                spark, args.index, _load_corpus(spark, args.corpus)
            )
            print(json.dumps(out))
            bad = out["missing_in_index"] + out["extra_in_index"] + out["sha_mismatch"]
            return 0 if bad == 0 else 3
        elif args.cmd == "compact":
            from go_dcp_elasticsearch_spark.sources.changes import compact_index

            print(json.dumps(compact_index(
                spark, args.index, target_docs_per_shard=args.target_docs_per_shard
            )))
        elif args.cmd == "agg":
            from go_dcp_elasticsearch_spark.index import BM25Query

            rng = None
            if args.range_spec:
                try:
                    rng = json.loads(args.range_spec)
                except json.JSONDecodeError as e:
                    p.error(f"--range is not valid JSON: {e}")
            tf_spec = None
            if args.terms_filter:
                try:
                    tf_spec = json.loads(args.terms_filter)
                except json.JSONDecodeError as e:
                    p.error(f"--terms-filter is not valid JSON: {e}")
            qq = BM25Query(spark, args.index)
            bool_kw = dict(
                must=args.must, should=args.should, must_not=args.must_not,
                filter=args.filter, minimum_should_match=args.msm, range=rng,
                terms_filter=tf_spec,
            )
            if args.agg == "terms":
                out = qq.agg_terms(args.field, size=args.size, **bool_kw)
            elif args.agg == "stats":
                out = qq.agg_stats(args.field, **bool_kw)
            else:
                if args.interval is None:
                    p.error("--agg histogram requires --interval")
                out = qq.agg_histogram(args.field, args.interval, **bool_kw)
            for row in out.collect():
                print(json.dumps(row.asDict()))
        else:
            from go_dcp_elasticsearch_spark.index import BM25Query

            qq = BM25Query(spark, args.index)
            if args.range_spec and args.mode != "bool":
                p.error("--range requires --mode bool")
            if args.terms_filter and args.mode != "bool":
                p.error("--terms-filter requires --mode bool")
            if args.after_score is not None and args.mode not in ("any", "all"):
                p.error("--after-score/--after-doc serve --mode any/all")
            if args.highlight and args.mode not in ("any", "all"):
                p.error("--highlight serves --mode any/all")
            if args.mode == "bool":
                if args.text or args.text_file:
                    p.error("--mode bool takes --must/--should/--must-not, "
                            "not --text/--text-file")
                rng = None
                if args.range_spec:
                    try:
                        rng = json.loads(args.range_spec)
                    except json.JSONDecodeError as e:
                        p.error(f"--range is not valid JSON: {e}")
                tf_spec = None
                if args.terms_filter:
                    try:
                        tf_spec = json.loads(args.terms_filter)
                    except json.JSONDecodeError as e:
                        p.error(f"--terms-filter is not valid JSON: {e}")
                hits = qq.topk_bool(
                    must=args.must, should=args.should,
                    must_not=args.must_not, filter=args.filter, k=args.k,
                    minimum_should_match=args.msm, strategy=args.strategy,
                    range=rng, terms_filter=tf_spec,
                )
                for row in hits.collect():
                    print(json.dumps({"doc_id": row["doc_id"], "score": row["score"]}))
                return 0
            if args.text_file:
                if args.mode in ("phrase", "prefix", "fuzzy", "wildcard"):
                    p.error(f"--mode {args.mode} serves single --text "
                            "queries (no batch path)")
                with open(args.text_file) as f:
                    batch = [(i, line.strip()) for i, line in enumerate(f) if line.strip()]
                for row in qq.topk_batch(batch, args.k, mode=args.mode).collect():
                    print(json.dumps({
                        "query_id": row["query_id"], "doc_id": row["doc_id"],
                        "score": row["score"],
                    }))
            elif args.text is not None:
                if args.mode == "phrase":
                    if not args.corpus:
                        p.error("--mode phrase requires --corpus (the source "
                                "table; the index stores only content_sha256)")
                    hits = qq.topk_phrase(
                        args.text, args.k,
                        source=_load_corpus(spark, args.corpus),
                        slop=args.slop,
                    )
                elif args.mode == "prefix":
                    hits = qq.topk_prefix(
                        args.text, args.k,
                        max_expansions=args.max_expansions,
                        strategy=args.strategy,
                    )
                elif args.mode == "fuzzy":
                    hits = qq.topk_fuzzy(
                        args.text, args.k,
                        max_edits=args.max_edits,
                        prefix_length=args.prefix_length,
                        max_expansions=args.max_expansions,
                        strategy=args.strategy,
                    )
                elif args.mode == "wildcard":
                    hits = qq.topk_wildcard(
                        args.text, args.k,
                        max_expansions=args.max_expansions,
                        strategy=args.strategy,
                    )
                else:
                    after = None
                    if (args.after_score is None) != (args.after_doc is None):
                        p.error("--after-score and --after-doc go together")
                    if args.after_score is not None:
                        after = (args.after_score, args.after_doc)
                    fn = qq.topk_pruned if args.strategy == "pruned" else qq.topk_exact
                    hits = fn(args.text, args.k, mode=args.mode, after=after)
                    if args.highlight:
                        if not args.corpus:
                            p.error("--highlight requires --corpus (the "
                                    "source table; the index stores "
                                    "content_sha256, not content)")
                        hits = qq.highlight(
                            hits, args.text, _load_corpus(spark, args.corpus),
                            window=args.highlight_window,
                        )
                for row in hits.collect():
                    print(json.dumps(row.asDict()))
            else:
                p.error("query requires --text or --text-file")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
