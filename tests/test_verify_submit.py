"""Source-parity verification (north-star sha256 invariant) and the
spark-submit --py-files deployment contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

from pyspark.sql import functions as F

from go_dcp_elasticsearch_spark.corpus import synth_corpus
from go_dcp_elasticsearch_spark.index import IndexBuilder, verify_index_against_source

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_verify_index_against_source(spark, tmp_path):
    idx = str(tmp_path / "idx_verify")
    corpus = synth_corpus(spark, 120)
    IndexBuilder(spark, idx, n_shards=3).build(corpus)

    # clean build: every row ok
    out = verify_index_against_source(spark, idx, corpus)
    assert out["n_docs"] == out["n_source"] == out["n_ok"] == 120
    assert out["missing_in_index"] == out["extra_in_index"] == out["sha_mismatch"] == 0

    # drift injections on the SOURCE side exercise each violation class
    victim = corpus.orderBy("repo", "path").limit(1)
    vrow = victim.collect()[0]
    drifted = corpus.withColumn(
        "content",
        F.when(
            (F.col("repo") == vrow["repo"]) & (F.col("path") == vrow["path"]),
            F.lit("driftedContent"),
        ).otherwise(F.col("content")),
    )
    out2 = verify_index_against_source(spark, idx, drifted, return_violations=True)
    assert out2["sha_mismatch"] == 1 and out2["n_ok"] == 119
    kinds = {(r["repo"], r["path"]): r["kind"] for r in out2["violations"].collect()}
    assert kinds == {(vrow["repo"], vrow["path"]): "sha_mismatch"}

    extra_src = corpus.unionByName(
        spark.createDataFrame(
            [("orgQ/extra", "src/x.py", "c0", "python", "extraDoc", 9999)],
            "repo string, path string, commit string, lang string, content string, seq_no int",
        )
    )
    out3 = verify_index_against_source(spark, idx, extra_src)
    assert out3["missing_in_index"] == 1 and out3["extra_in_index"] == 0

    shrunk_src = corpus.filter(
        ~((F.col("repo") == vrow["repo"]) & (F.col("path") == vrow["path"]))
    )
    out4 = verify_index_against_source(spark, idx, shrunk_src)
    assert out4["extra_in_index"] == 1 and out4["missing_in_index"] == 0


def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north-rule deployment contract, actually executed: package the
    engine as a zip, run `spark-submit --py-files engine.zip` for build,
    verify, and query against real testdata — the workers resolve the
    package from the zip, not the repo checkout."""
    spark_submit = "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("spark-submit not on this machine")

    zip_path = str(tmp_path / "engine.zip")
    pkg = os.path.join(REPO, "go_dcp_elasticsearch_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))

    # stage a corpus parquet from the documents fixture via plain python
    # (avoid importing spark twice); reuse the sf0.001 parquet directly by
    # building from a corpus staged by the CLI itself is circular — so
    # pre-stage with duckdb (no engine involvement).
    import duckdb

    corpus_path = str(tmp_path / "corpus.parquet")
    duckdb.sql(
        "COPY (SELECT 'corpus' AS repo, printf('doc/%012d', doc_id) AS path, "
        'substr(sha256(text), 1, 12) AS "commit", lang, text AS content, '
        "CAST(doc_id AS INT) AS seq_no "
        "FROM '/root/testdata/sf0.001/documents.parquet') "
        f"TO '{corpus_path}' (FORMAT PARQUET)"
    )

    idx = str(tmp_path / "idx_submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    main_py = os.path.join(REPO, "go_dcp_elasticsearch_spark", "__main__.py")

    def submit(*args):
        return subprocess.run(
            [spark_submit, "--master", "local[4]", "--py-files", zip_path,
             main_py, *args],
            capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
        )

    r = submit("build", "--corpus", corpus_path, "--index", idx, "--shards", "4")
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["n_docs"] == 500

    r = submit("verify", "--index", idx, "--corpus", corpus_path)
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert out["n_ok"] == 500 and out["sha_mismatch"] == 0

    r = submit("query", "--index", idx, "--text", "spark filter join", "--k", "5")
    assert r.returncode == 0, r.stderr[-3000:]
    hits = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert len(hits) == 5 and hits[0]["doc_id"] == 282

    r = submit("query", "--index", idx, "--mode", "bool", "--must", "spark",
               "--should", "window", "--must-not", "customer", "--k", "5")
    assert r.returncode == 0, r.stderr[-3000:]
    hits = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert 0 < len(hits) <= 5


def test_verify_null_content_is_ok_not_missing(spark, tmp_path):
    """Review regression (round 3): a row present on BOTH sides with NULL
    content (sha2(NULL)=NULL) must classify as ok — nullity of the sha is
    not evidence of absence."""
    idx = str(tmp_path / "idx_null")
    spark.createDataFrame(
        [("r1", "p1", None), ("r2", "p2", "abc123")],
        "repo string, path string, content_sha256 string",
    ).write.parquet(f"{idx}/docs")
    src = spark.createDataFrame(
        [("r1", "p1", None), ("r2", "p2", "different content")],
        "repo string, path string, content string",
    )
    out = verify_index_against_source(spark, idx, src)
    assert out["n_ok"] == 1  # the null row
    assert out["sha_mismatch"] == 1  # r2 drifted
    assert out["missing_in_index"] == 0 and out["extra_in_index"] == 0


def test_oracle_index_fingerprint_guard(spark, tmp_path):
    """Review regression (round 3): the cached /tmp oracle index must be
    invalidated when the fixture at the same path changes (resume=True
    would otherwise serve stale results forever)."""
    import shutil
    import time as _time

    import __spark_entry__ as entrymod

    sf_dir = str(tmp_path / "sfX")
    os.makedirs(sf_dir)
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                f"{sf_dir}/documents.parquet")
    def _lineage_blob(idx):
        d = f"{idx}/_lineage"
        return "".join(
            open(os.path.join(d, fn)).read()
            for fn in sorted(os.listdir(d))
            if fn.startswith("rec-")  # skip local-FS hidden .crc files
        )

    idx1 = entrymod._oracle_index(spark, sf_dir)
    fp1 = open(f"{idx1}/_fixture_fp").read()
    lineage1 = _lineage_blob(idx1)
    # unchanged fixture -> resume (lineage not re-written)
    idx2 = entrymod._oracle_index(spark, sf_dir)
    assert idx2 == idx1
    assert _lineage_blob(idx1) == lineage1
    # touched fixture (new mtime) -> fingerprint differs -> full rebuild
    _time.sleep(1.1)
    os.utime(f"{sf_dir}/documents.parquet")
    idx3 = entrymod._oracle_index(spark, sf_dir)
    fp3 = open(f"{idx3}/_fixture_fp").read()
    assert fp3 != fp1
    assert _lineage_blob(idx3) != lineage1
    shutil.rmtree(idx1, ignore_errors=True)
