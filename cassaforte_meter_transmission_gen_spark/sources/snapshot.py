"""Minimal snapshot-manifest table — the lakehouse primitive.

Delta/Iceberg jars are unfetchable in this environment (documented in
README, same disposition as ``spark-avro`` → ``sources/avro_codec.py``),
so this module implements the smallest useful slice of a lakehouse
table format from scratch, the way the Avro gap was closed: an ATOMIC
commit file, a DATA-FILE MANIFEST, and AS-OF (time-travel) reads.

Reference parity note: the reference engine (``core.clj``) has no table
format at all — its sink is fire-and-forget CQL inserts. This module is
part of the 100 TB extension surface: it is what makes the streaming
commit-log protocol's state tables PARTIALLY rewritable, which is the
difference between O(touched buckets) and O(whole ledger) per
micro-batch for corpus-proportional state.

Layout under ``root/``::

    data/snap=<sid>/_pb=<bucket>/part-*.parquet   (one Spark write/commit)
    manifests/<sid, zero-padded 20>.json          (atomic os.replace)

A manifest is the COMPLETE table state at one snapshot::

    {"snapshot_id": 3, "parent": 2,
     "buckets": {"0": ["data/snap=1/_pb=0/part-...parquet"],
                 "1": ["data/snap=3/_pb=1/part-...parquet"]}}

Buckets a commit does not touch are carried forward BY REFERENCE — the
new manifest points at the old snapshot's files, which are never
rewritten (the untouched-bucket filesystem unit in
``tests/test_snapshot.py`` pins them byte-identical). The manifest
rename is the commit point: data files land first, so a crash before
the rename leaves the previous manifest authoritative and the orphaned
``data/snap=<sid>`` directory is simply overwritten on replay —
exactly-once composes with the streaming commit-log protocol by using
the micro-batch id as the snapshot id.

Scale: at 100 TB the bucket count is sized so one bucket's files fit an
executor (e.g. 4096 buckets → ~25 GB/bucket); a micro-batch rewrites
only the buckets its keys hash into, and the manifest (one JSON row per
bucket) stays driver-trivial. Readers plan from the manifest alone — no
directory listing of the data tree, which is the same economics that
make real lakehouse formats listable at millions of files.

Concurrency contract: SINGLE WRITER (the Structured Streaming
foreachBatch driver), many readers — the same contract as the repo's
commit-log protocol. Same-snapshot-id re-commits are no-ops (replay
idempotence); racing INDEPENDENT writers would need a compare-and-swap
on the manifest chain (real lakehouse formats use a catalog/log-store
CAS for this), deliberately out of scope for a streaming state table
whose writes are serialized by the micro-batch engine.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: partition directory name for the physical bucket column. The bucket
#: id is ALSO a regular data column (``bucket``) inside every file so
#: reads planned from an explicit file list don't depend on Spark's
#: partition-discovery (which needs a basePath and directory layout).
_PB = "_pb"


class SnapshotTable:
    """A bucketed table whose state is a chain of immutable snapshots.

    ``schema`` is the full read schema INCLUDING the ``bucket int``
    column; ``n_buckets`` is fixed at table creation (changing it would
    re-key every row — same contract as a bucketed Hive table).
    """

    def __init__(
        self,
        root: str,
        schema: str,
        n_buckets: int,
        stats_cols: tuple[str, ...] = (),
    ) -> None:
        self.root = root
        self.schema = schema
        self.n_buckets = n_buckets
        #: columns whose per-file min/max land in the manifest at commit
        #: time (Iceberg-style file stats) — readers with a range
        #: predicate skip files whose range is disjoint, BEFORE any
        #: data I/O. Works when the bucketing function CLUSTERS the
        #: column (range buckets); under hash bucketing every file
        #: spans the domain and stats prune nothing (kept honest by
        #: the unit test).
        self.stats_cols = tuple(stats_cols)
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # --- manifest chain ---

    def _manifest_path(self, sid: int) -> str:
        return os.path.join(self.root, "manifests", f"{sid:020d}.json")

    def snapshots(self) -> list[int]:
        mdir = os.path.join(self.root, "manifests")
        return sorted(
            int(f[:-5])
            for f in os.listdir(mdir)
            if f.endswith(".json") and not f.endswith(".tmp.json")
        )

    def latest(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def manifest(self, sid: int) -> dict:
        with open(self._manifest_path(sid)) as fh:
            return json.load(fh)

    def schema_at(self, sid: int | None = None) -> str:
        """Read schema in force at a snapshot: the manifest's recorded
        schema if the table ever evolved, else the table default.
        Schema evolution is ADD-COLUMN-only (the lakehouse-safe kind):
        older data files simply lack the new column and Spark's
        schema-pinned parquet read fills it with null — the reader
        applies the declared default. Renames/drops would need file
        rewrites and are deliberately unsupported."""
        if sid is None:
            sid = self.latest()
        if sid is None:
            return self.schema
        return self.manifest(sid).get("schema") or self.schema

    def bucket_files(self, sid: int | None) -> dict[int, list[str]]:
        """Bucket → absolute data-file paths at snapshot ``sid`` (the
        latest when ``None``). Empty dict for an empty/unborn table."""
        if sid is None:
            sid = self.latest()
        if sid is None:
            return {}
        man = self.manifest(sid)
        return {
            int(b): [os.path.join(self.root, p) for p in paths]
            for b, paths in man["buckets"].items()
        }

    # --- reads ---

    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        buckets: list[int] | None = None,
        between: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """Schema-pinned read of the table AS OF a snapshot (time
        travel), optionally pruned to a bucket subset — the partial
        read that makes per-bucket merges O(touched), planned from the
        manifest alone (no data-tree listing).

        ``between=(col, lo, hi)``: additionally SKIP files whose
        manifest-recorded [min, max] for ``col`` is disjoint from
        [lo, hi] — plan-time data skipping with zero data I/O
        (files without recorded stats are kept; the predicate itself
        must still be applied by the caller — stats only prune)."""
        files = self.bucket_files(as_of)
        if buckets is not None:
            files = {b: files[b] for b in buckets if b in files}
        paths = [p for ps in files.values() for p in ps]
        if between is not None:
            paths = self.prune_paths(paths, as_of, between)
        schema = self.schema_at(as_of)
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)

    def prune_paths(
        self,
        paths: list[str],
        as_of: int | None,
        between: tuple[str, object, object],
    ) -> list[str]:
        """The stats-skip decision, exposed so tests and callers can
        count survivors: keep a file unless its recorded [min, max]
        for the column is provably disjoint from [lo, hi]."""
        sid = self.latest() if as_of is None else as_of
        stats = self.manifest(sid).get("stats") or {}
        col, lo, hi = between
        keep = []
        for p in paths:
            rel = os.path.relpath(p, self.root)
            mm = stats.get(rel, {}).get(col)
            if mm is not None and (mm[0] > hi or mm[1] < lo):
                continue  # provably disjoint — skip without opening
            keep.append(p)
        return keep

    # --- commits ---

    def _replayed(self, sid: int) -> bool:
        if os.path.exists(self._manifest_path(sid)):
            return True  # replayed commit — already the committed truth
        parent = self.latest()
        # replay of a pruned/old id under a newer snapshot
        return parent is not None and sid <= parent

    def _write_snap_files(
        self, df: DataFrame, sid: int
    ) -> dict[str, list[str]]:
        """Land ``df`` under ``data/snap=<sid>`` (one Spark write,
        bucket-partitioned directories) and return bucket → new
        relative file paths. Mode=overwrite so a crashed attempt's
        orphan directory is simply replaced on retry."""
        snap_dir = os.path.join(self.root, f"data/snap={sid}")
        (
            df.withColumn(_PB, F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy(_PB)
            .parquet(snap_dir)
        )
        new_files: dict[str, list[str]] = {}
        for entry in os.listdir(snap_dir):
            if not entry.startswith(f"{_PB}="):
                continue
            b = entry.split("=", 1)[1]
            rel = f"data/snap={sid}/{entry}"
            new_files[b] = sorted(
                f"{rel}/{f}"
                for f in os.listdir(os.path.join(snap_dir, entry))
                if f.endswith(".parquet") and not f.startswith("_")
            )
        return new_files

    def _file_stats(
        self, new_files: dict[str, list[str]]
    ) -> dict[str, dict[str, list]]:
        """Per-file min/max for ``stats_cols``, read from the parquet
        FOOTERS of the just-written files (the stats already exist
        there; recording them in the manifest moves the skip decision
        to plan time with zero data I/O — Iceberg's manifest stats).
        Bounded work: one footer per file per commit."""
        if not self.stats_cols:
            return {}
        import pyarrow.parquet as pq

        stats: dict[str, dict[str, list]] = {}
        for paths in new_files.values():
            for rel in paths:
                md = pq.ParquetFile(os.path.join(self.root, rel)).metadata
                per_col: dict[str, list] = {}
                for col in self.stats_cols:
                    idx = md.schema.names.index(col)
                    los, his = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            break
                        los.append(st.min)
                        his.append(st.max)
                    else:
                        if los:
                            per_col[col] = [min(los), max(his)]
                if per_col:
                    stats[rel] = per_col
        return stats

    def _publish(
        self,
        sid: int,
        buckets: dict[str, list[str]],
        schema: str | None = None,
        new_stats: dict[str, dict[str, list]] | None = None,
    ) -> None:
        parent = self.latest()
        # file stats carry forward for files still referenced; new
        # files bring their own footers' min/max
        stats = (
            dict(self.manifest(parent).get("stats") or {})
            if parent is not None
            else {}
        )
        stats.update(new_stats or {})
        live = {p for ps in buckets.values() for p in ps}
        stats = {p: s for p, s in stats.items() if p in live}
        man = {
            "snapshot_id": sid,
            "parent": parent,
            # schema carries forward once evolved (add-column-only)
            "schema": schema or self.schema_at(),
            "buckets": buckets,
            "stats": stats,
        }
        tmp = self._manifest_path(sid) + ".tmp.json"
        with open(tmp, "w") as fh:
            json.dump(man, fh, sort_keys=True)
        os.replace(tmp, self._manifest_path(sid))

    def commit(
        self,
        touched: DataFrame,
        sid: int,
        schema: str | None = None,
        emptied_buckets: list[int] | None = None,
    ) -> None:
        """Commit snapshot ``sid``: ``touched`` holds the COMPLETE new
        content of every bucket it contains (and nothing from other
        buckets); untouched buckets carry forward by manifest
        reference. Idempotent: an existing manifest for ``sid`` makes
        this a no-op (the streaming replay guard); a crash mid-write
        leaves the parent manifest authoritative and the orphan data
        directory is overwritten on the retried commit.

        ``schema``: evolve the read schema from this snapshot on
        (ADD-COLUMN-only; see :meth:`schema_at`). ``emptied_buckets``:
        buckets whose new content is ZERO rows — an empty bucket
        writes no partition directory, so without this list it would
        silently carry forward instead of emptying (the compliance-
        delete case)."""
        if self._replayed(sid):
            return
        new_files = self._write_snap_files(touched, sid)
        parent = self.latest()
        buckets = (
            dict(self.manifest(parent)["buckets"])
            if parent is not None
            else {}
        )
        buckets.update(new_files)
        for b in emptied_buckets or ():
            buckets.setdefault(str(b), [])
            if str(b) not in new_files:
                buckets[str(b)] = []
        self._publish(
            sid, buckets, schema=schema,
            new_stats=self._file_stats(new_files),
        )

    def commit_append(self, delta: DataFrame, sid: int) -> None:
        """LSM-style DELTA commit: ``delta``'s files are APPENDED to
        their buckets' file lists instead of replacing them — per-batch
        cost is O(batch) regardless of how many buckets the batch's
        keys hash into, with NO read of committed state at all. This is
        the write-optimized dual of :meth:`commit` for MERGEABLE tables
        (the reader folds base+deltas with an associative aggregate,
        e.g. the chunk ledger's MIN/SUM): under uniform key hashing a
        large micro-batch touches every bucket, so the partial-REWRITE
        shape degrades to a full rewrite — the append shape does not.
        Read amplification grows with delta count until
        :meth:`compact` folds them; same crash/replay idempotence as
        commit (manifest rename is the commit point; a retried crashed
        append overwrites its own orphan snap directory)."""
        if self._replayed(sid):
            return
        new_files = self._write_snap_files(delta, sid)
        parent = self.latest()
        buckets = (
            dict(self.manifest(parent)["buckets"])
            if parent is not None
            else {}
        )
        for b, fs in new_files.items():
            buckets[b] = list(buckets.get(b, [])) + fs
        self._publish(
            sid, buckets, new_stats=self._file_stats(new_files)
        )


    def changed_buckets(self, sid_a: int, sid_b: int) -> list[int]:
        """Buckets whose file lists DIFFER between two snapshots — the
        manifest-level change feed: an incremental consumer (diff,
        downstream sync, CDC read) plans from this list and scans ONLY
        changed buckets at both versions, never the whole table. Pure
        metadata — no data files are opened."""
        ba = self.manifest(sid_a)["buckets"]
        bb = self.manifest(sid_b)["buckets"]
        return sorted(
            int(b)
            for b in set(ba) | set(bb)
            if ba.get(b, []) != bb.get(b, [])
        )

    # --- maintenance: compaction, expiry, vacuum ---

    def compact(self, spark: SparkSession, sid: int) -> None:
        """Fold the accumulated per-snapshot small files into ONE file
        per bucket at a new snapshot ``sid`` — the answer to the
        streaming commit-log's file-count growth (README's compaction
        contract): the table's content is unchanged (the compaction
        query value-hash gates this), only the file layout collapses.
        Crash-safe like any commit: the manifest rename publishes the
        compacted layout atomically; until then readers plan from the
        parent manifest over the old files."""
        state = self.read(spark).repartition("bucket")
        self.commit(state, sid)

    def expire(self, keep_from: int) -> list[int]:
        """Drop manifests below ``keep_from`` (trimming the time-travel
        window — the reader-consistency retention contract). Manifests
        are self-contained (each lists the COMPLETE table state), so
        expiring old ones cannot affect newer reads. The latest
        manifest is never expired. Returns the expired ids."""
        latest = self.latest()
        expired = []
        for sid in self.snapshots():
            if sid < keep_from and sid != latest:
                os.remove(self._manifest_path(sid))
                expired.append(sid)
        return expired

    def vacuum(self) -> list[str]:
        """Delete data files referenced by NO retained manifest (the
        orphan GC that makes expire reclaim space — also sweeps debris
        from crashed commits). Walks the data tree, keeps exactly the
        union of retained manifests' file lists, removes the rest and
        any emptied directories. Returns deleted paths."""
        referenced: set[str] = set()
        for sid in self.snapshots():
            for paths in self.manifest(sid)["buckets"].values():
                referenced.update(
                    os.path.join(self.root, p) for p in paths
                )
        deleted = []
        data_root = os.path.join(self.root, "data")
        for dirpath, _dirs, files in os.walk(data_root, topdown=False):
            for f in files:
                p = os.path.join(dirpath, f)
                if p not in referenced:
                    os.remove(p)
                    deleted.append(p)
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
        return deleted


def bucket_of(col: str, n_buckets: int):
    """The table's bucketing function: non-negative hash bucket of a
    key column (``pmod`` mirrors floor-mod, same nuance as the host-id
    seed — functions/hashing.py)."""
    return F.pmod(F.hash(F.col(col)), F.lit(n_buckets)).cast("int")
