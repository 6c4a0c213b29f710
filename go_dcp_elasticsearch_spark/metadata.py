"""Shared record-log storage for the control-plane metadata (lineage
checkpoints, metrics counters, snapshot commit log).

Layout under one log directory (all through the Hadoop FS layer, so the
log lives NEXT TO THE DATA on HDFS/S3A — the reference keeps its DCP
checkpoint in the metadata bucket, connector.go:186):

  rec-<tag>-<seq>.json    one immutable file per record; becomes durable
                          and visible atomically on close (hsync on HDFS,
                          OS fsync on local, PUT-on-close on S3A) — the
                          ack-gated commit point. Per-record files rather
                          than an appended JSONL because append() is
                          unsupported on S3A.
  ckpt-<total>-<tag>.jsonl checkpoint: all records known at compaction
                          time, one line each as {"_name": ..., "rec": ...}
                          (the Delta/Iceberg checkpoint pattern). Written
                          when the live rec-file count passes
                          COMPACT_THRESHOLD so reads stay O(1) files, not
                          one round-trip per historical record.
  <legacy>.jsonl          pre-round-4 appended log, read transparently
                          and folded into the first checkpoint.

Crash safety of compaction: the new checkpoint is durable BEFORE any
superseded file is deleted; a crash mid-delete leaves duplicates, which
reads de-duplicate by record NAME (records are immutable, so the first
occurrence wins). ``count()`` never opens the checkpoint — the total is
carried in its file name — so the per-query index-epoch check stays one
directory listing.
"""

from __future__ import annotations

import json
import uuid

# compaction trigger: live per-record files before they are folded into a
# checkpoint. Low enough that long-running streaming ingest (a few commits
# per micro-batch) never accumulates unbounded tiny files; high enough
# that batch builds (a handful of commits) never pay a compaction.
COMPACT_THRESHOLD = 256


class RecordLog:
    def __init__(self, spark, path: str, legacy_name: str | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        self.legacy_name = legacy_name
        self._tag = uuid.uuid4().hex[:12]
        self._seq = 0
        self._legacy_count: int | None = None

    # ---------- reads ----------

    def _names(self) -> list[str]:
        from go_dcp_elasticsearch_spark.fsutil import list_root_files

        return list_root_files(self.spark, self.path)

    def _named_records(self, names: list[str]) -> list[tuple[str, dict]]:
        """(name, record) pairs, de-duplicated by name (first wins),
        oldest source first: legacy log, checkpoints, live rec files."""
        from go_dcp_elasticsearch_spark.fsutil import read_file

        out: dict[str, dict] = {}
        if self.legacy_name and self.legacy_name in names:
            body = read_file(self.spark, f"{self.path}/{self.legacy_name}")
            for i, line in enumerate(body.splitlines()):
                if line.strip():
                    out.setdefault(f"{self.legacy_name}:{i:08d}", json.loads(line))
        for name in sorted(n for n in names if n.startswith("ckpt-")):
            for line in read_file(self.spark, f"{self.path}/{name}").splitlines():
                if line.strip():
                    e = json.loads(line)
                    out.setdefault(e["_name"], e["rec"])
        for name in sorted(n for n in names if n.startswith("rec-") and n.endswith(".json")):
            if name not in out:
                out[name] = json.loads(read_file(self.spark, f"{self.path}/{name}"))
        return list(out.items())

    def records(self) -> list[dict]:
        return [r for _, r in self._named_records(self._names())]

    def count(self) -> int:
        """Cheap monotonic record count — ONE directory listing, no file
        reads except a legacy log that has not been compacted yet. A
        crash mid-compaction can briefly over-count (checkpoint total +
        not-yet-deleted rec files); callers using this as an index epoch
        just refresh once more."""
        from go_dcp_elasticsearch_spark.fsutil import read_file

        names = self._names()
        total = max(
            (int(n.split("-")[1]) for n in names if n.startswith("ckpt-")),
            default=0,
        )
        total += sum(1 for n in names if n.startswith("rec-") and n.endswith(".json"))
        if self.legacy_name and self.legacy_name in names:
            # the legacy file is immutable until compaction deletes it:
            # count its lines once per log instance, not per call (an
            # epoch check runs per QUERY — re-reading a 10k-line file
            # each time would be a full object GET on S3A)
            if self._legacy_count is None:
                body = read_file(self.spark, f"{self.path}/{self.legacy_name}")
                self._legacy_count = sum(1 for line in body.splitlines() if line.strip())
            total += self._legacy_count
        return total

    # ---------- writes ----------

    def append(self, rec: dict) -> None:
        from go_dcp_elasticsearch_spark.fsutil import write_file

        self._seq += 1
        write_file(
            self.spark,
            f"{self.path}/rec-{self._tag}-{self._seq:06d}.json",
            json.dumps(rec),
        )
        names = self._names()
        if sum(1 for n in names if n.startswith("rec-")) > COMPACT_THRESHOLD:
            self._compact(names)

    def _compact(self, names: list[str]) -> None:
        from go_dcp_elasticsearch_spark.fsutil import delete_dir, write_file

        named = self._named_records(names)
        ckpt = f"ckpt-{len(named):08d}-{uuid.uuid4().hex[:12]}.jsonl"
        write_file(
            self.spark,
            f"{self.path}/{ckpt}",
            "\n".join(json.dumps({"_name": n, "rec": r}) for n, r in named),
        )
        # the new checkpoint is durable; superseded files are now garbage
        # (crash mid-delete => duplicates, de-duplicated by name on read)
        for name in names:
            if name == ckpt:
                continue
            if (
                name.startswith(("rec-", "ckpt-"))
                or (self.legacy_name and name == self.legacy_name)
            ):
                delete_dir(self.spark, f"{self.path}/{name}")
