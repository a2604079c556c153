"""Manifest-commit transactional parquet table — exactly-once batch sink.

The reference's delivery contract is at-least-once (offsets advance only
after produce, consumer.js:243,254); its DLQ/file outputs can therefore
duplicate on redelivery. This module closes the long-standing LIMITS.md
row "Exactly-once file sinks" with the standard table-format recipe
(the same commit protocol Delta Lake / Iceberg use, reduced to its
load-bearing core):

    table_root/
      data/txn-<uuid>/part-*.parquet     -- immutable data files
      _manifests/v<20-digit>.json        -- one snapshot per committed version

- **Writers never mutate visible state.** Data files land under a
  per-transaction directory that no reader ever lists; visibility comes
  ONLY from a manifest that names them.
- **Commit = one atomic rename.** The manifest is written to a temp name
  and renamed to ``v<version>.json`` via the Hadoop FileSystem API,
  whose file-rename refuses to replace an existing destination (local
  FS and HDFS; verified in tests). Two racing writers targeting the
  same version: exactly one rename wins, the loser re-reads the new
  latest snapshot, rebases its file list, and retries against version+1
  — optimistic concurrency with no lock service.
- **Readers resolve the latest manifest** (max version in one directory
  listing) and read exactly the files it names. A crashed writer leaves
  orphan data files and possibly a temp manifest — invisible, cleaned
  opportunistically by ``vacuum()``.
- **Idempotent replay.** Every commit may carry a ``txn_id``; committed
  ids accumulate in the manifest. An ``append`` whose txn_id is already
  committed is a no-op — so a Structured Streaming ``foreachBatch``
  retry (same epoch id re-delivered after a sink-side crash) commits
  once, upgrading the at-least-once stream to effectively-once end to
  end. This is exactly the (epochId, txnId) dedup contract Spark
  documents for idempotent sinks.

Scale notes: the commit path does O(1) driver-side work per transaction
(one listing of ``_manifests/``, one manifest read, one write+rename) —
no data movement; data files are written by executors with full
parallelism. The manifest stores ONE path per file; at 100 TB /
~100k files that is a few MB of JSON — beyond that, real formats split
the file list into avro manifest segments, which changes encoding, not
the commit protocol. On S3 without a consistency layer the rename is
copy+delete and NOT atomic — production deployments there back the
commit with a conditional put or a lock table (documented limitation,
as in Delta's LogStore abstraction).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST_DIR = "_manifests"
DATA_DIR = "data"
_VERSION_WIDTH = 20


class CommitConflict(RuntimeError):
    """Raised internally when a manifest rename loses a race."""


class _HadoopFS:
    """Thin py4j wrapper over org.apache.hadoop.fs.FileSystem so the
    table works on any Spark-supported filesystem, not just file://."""

    def __init__(self, spark: SparkSession, root: str):
        self._jvm = spark._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def path(self, p: str):
        return self._Path(p)

    def exists(self, p: str) -> bool:
        return self._fs.exists(self.path(p))

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self.path(p))

    def list_names(self, p: str) -> list[str]:
        if not self.exists(p):
            return []
        return [
            st.getPath().getName() for st in self._fs.listStatus(self.path(p))
        ]

    def list_files_recursive(self, p: str, suffix: str) -> list[str]:
        """Fully-qualified paths of all files under ``p`` ending in
        ``suffix`` (one level of txn subdirectories in practice)."""
        out: list[str] = []
        if not self.exists(p):
            return out
        it = self._fs.listFiles(self.path(p), True)
        while it.hasNext():
            f = it.next().getPath()
            if f.getName().endswith(suffix):
                out.append(f.toString())
        return out

    def write_text(self, p: str, text: str) -> None:
        stream = self._fs.create(self.path(p), True)
        try:
            stream.write(bytearray(text.encode("utf-8")))
        finally:
            stream.close()

    def read_text(self, p: str) -> str:
        stream = self._fs.open(self.path(p))
        try:
            reader = self._jvm.java.io.BufferedReader(
                self._jvm.java.io.InputStreamReader(stream, "UTF-8")
            )
            chunks = []
            line = reader.readLine()
            while line is not None:
                chunks.append(line)
                line = reader.readLine()
            return "\n".join(chunks)
        finally:
            stream.close()

    def rename_no_overwrite(self, src: str, dst: str) -> bool:
        """Atomic publish: Hadoop's file rename returns False (and moves
        nothing) when ``dst`` exists — local FS and HDFS. This is the
        whole commit protocol."""
        return bool(self._fs.rename(self.path(src), self.path(dst)))

    def delete(self, p: str, recursive: bool = False) -> None:
        if self.exists(p):
            self._fs.delete(self.path(p), recursive)


def _version_of(name: str) -> int | None:
    if name.startswith("v") and name.endswith(".json"):
        core = name[1 : -len(".json")]
        if core.isdigit():
            return int(core)
    return None


class TxnTable:
    """A parquet table whose visible state is a committed manifest.

    >>> t = TxnTable(spark, "/data/events_table")
    >>> t.append(df, txn_id="batch-7")     # no-op if batch-7 committed
    >>> t.read().count()
    >>> t.overwrite(df2)
    >>> t.merge(updates, key_cols=["c_custkey"])   # copy-on-write upsert
    >>> t.read(version=3)                  # time travel
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        self.fs = _HadoopFS(spark, self.root)
        self.manifest_dir = f"{self.root}/{MANIFEST_DIR}"
        self.data_dir = f"{self.root}/{DATA_DIR}"

    # ------------------------------------------------------------ snapshots

    def latest_version(self) -> int | None:
        versions = [
            v
            for v in (_version_of(n) for n in self.fs.list_names(self.manifest_dir))
            if v is not None
        ]
        return max(versions) if versions else None

    def _manifest_path(self, version: int) -> str:
        return f"{self.manifest_dir}/v{version:0{_VERSION_WIDTH}d}.json"

    def snapshot(self, version: int | None = None) -> dict:
        """The committed manifest dict for ``version`` (default latest);
        the empty snapshot if the table has no commits yet."""
        if version is None:
            version = self.latest_version()
        if version is None:
            return {"version": -1, "files": [], "committed_txns": []}
        return json.loads(self.fs.read_text(self._manifest_path(version)))

    def committed_txns(self) -> set[str]:
        return set(self.snapshot().get("committed_txns", []))

    # -------------------------------------------------------------- reading

    def read(self, version: int | None = None) -> DataFrame:
        """DataFrame of the table at ``version`` (default: latest). Only
        manifest-listed files are read — uncommitted/orphan data files
        are invisible by construction."""
        snap = self.snapshot(version)
        files = snap["files"]
        if not files:
            raise ValueError(
                f"TxnTable at {self.root}: no committed snapshot"
                + (f" for version {version}" if version is not None else "")
            )
        return self.spark.read.parquet(*files)

    # -------------------------------------------------------------- writing

    def _stage(self, df: DataFrame) -> list[str]:
        """Write ``df``'s files under a fresh txn directory and return
        their fully-qualified paths. Nothing is visible yet."""
        txn_dir = f"{self.data_dir}/txn-{uuid.uuid4().hex}"
        df.write.mode("errorifexists").parquet(txn_dir)
        return sorted(self.fs.list_files_recursive(txn_dir, ".parquet"))

    def _try_commit(self, manifest: dict) -> bool:
        version = manifest["version"]
        self.fs.mkdirs(self.manifest_dir)
        tmp = f"{self.manifest_dir}/.tmp-{uuid.uuid4().hex}.json"
        self.fs.write_text(tmp, json.dumps(manifest, indent=1))
        ok = self.fs.rename_no_overwrite(tmp, self._manifest_path(version))
        if not ok:
            self.fs.delete(tmp)
        return ok

    def _commit(
        self,
        new_files: list[str],
        operation: str,
        txn_id: str | None,
        replace: bool,
        max_retries: int = 20,
    ) -> int | None:
        """Optimistic-concurrency commit loop. Returns the committed
        version, or None when ``txn_id`` was already committed (replay
        no-op). Staged files for a skipped replay are deleted."""
        for _ in range(max_retries):
            snap = self.snapshot()
            committed = snap.get("committed_txns", [])
            if txn_id is not None and txn_id in committed:
                # replay of an already-committed transaction: drop the
                # newly staged (invisible) files and do nothing
                for f in new_files:
                    self.fs.delete(f)
                return None
            manifest = {
                "version": snap["version"] + 1,
                "parent_version": snap["version"],
                "operation": operation,
                "txn_id": txn_id,
                "files": (
                    list(new_files)
                    if replace
                    else list(snap["files"]) + list(new_files)
                ),
                "committed_txns": committed + ([txn_id] if txn_id else []),
            }
            if self._try_commit(manifest):
                return manifest["version"]
            # lost the race: rebase on the winner's snapshot and retry
        raise CommitConflict(
            f"TxnTable {self.root}: {max_retries} commit attempts lost races"
        )

    def append(self, df: DataFrame, txn_id: str | None = None) -> int | None:
        """Append ``df`` as a new snapshot. With ``txn_id``, replaying
        the same transaction is a no-op (exactly-once foreachBatch)."""
        if txn_id is not None and txn_id in self.committed_txns():
            return None  # cheap pre-check: skip staging entirely
        return self._commit(self._stage(df), "append", txn_id, replace=False)

    def overwrite(self, df: DataFrame, txn_id: str | None = None) -> int | None:
        """Replace the table contents with ``df`` (old files stay on
        disk for time travel until ``vacuum``)."""
        if txn_id is not None and txn_id in self.committed_txns():
            return None
        return self._commit(self._stage(df), "overwrite", txn_id, replace=True)

    def merge(
        self,
        updates: DataFrame,
        key_cols: list[str],
        txn_id: str | None = None,
    ) -> int | None:
        """Copy-on-write MERGE (SCD-1 upsert): matched keys take the
        update row, unmatched updates insert, unmatched base rows carry
        through — the same full-outer-join + COALESCE plan as the
        registered ``merge_upsert`` query (queries/llm_extra.py), with
        the result committed as an ``overwrite`` snapshot. One
        key-partitioned shuffle join; with base and updates bucketed on
        the key the base side needs no exchange (see
        ``operators/storage.write_bucketed``)."""
        from pyspark.sql import functions as F

        base = self.read()
        cols = base.columns
        if set(updates.columns) != set(cols):
            raise ValueError(
                f"merge schema mismatch: table {cols} vs updates "
                f"{updates.columns}"
            )
        u, b = updates.alias("u"), base.alias("b")
        cond = None
        for k in key_cols:
            c = F.col(f"u.{k}").eqNullSafe(F.col(f"b.{k}"))
            cond = c if cond is None else cond & c
        merged = u.join(b, cond, "full_outer").select(
            *[
                F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c)
                for c in cols
            ]
        )
        if txn_id is not None and txn_id in self.committed_txns():
            return None
        return self._commit(self._stage(merged), "merge", txn_id, replace=True)

    # ------------------------------------------------------------- cleanup

    def vacuum(self) -> int:
        """Delete data files not referenced by ANY committed manifest
        (crashed writers' orphans). Files referenced by old versions are
        kept — time travel stays intact. Returns removed-file count."""
        referenced: set[str] = set()
        for name in self.fs.list_names(self.manifest_dir):
            v = _version_of(name)
            if v is not None:
                referenced.update(self.snapshot(v)["files"])
        removed = 0
        for f in self.fs.list_files_recursive(self.data_dir, ".parquet"):
            if f not in referenced:
                self.fs.delete(f)
                removed += 1
        # also sweep abandoned temp manifests
        for name in self.fs.list_names(self.manifest_dir):
            if name.startswith(".tmp-"):
                self.fs.delete(f"{self.manifest_dir}/{name}")
        return removed
