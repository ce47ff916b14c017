"""Manifest-committed parquet tables: atomic append, time travel,
compaction — the minimal transactional-table-format core (the idea
underneath Delta/Iceberg/Hudi) with zero library dependencies.

Why this exists at 100 TB: a plain ``mode("append")`` parquet
directory has no commit point — readers see half-written files,
failed jobs leave poison partials, and there is no way to ask "what
did the table contain yesterday".  The fix is the standard log-of-
manifests design:

- Data files are IMMUTABLE; a writer stages them under a unique
  subdirectory no reader ever lists.
- A MANIFEST (JSON: schema + explicit file list) defines a table
  version.  Readers read files named by a manifest — never by
  directory listing — so unreferenced partials are invisible.
- Publishing a manifest is one atomic ``os.link`` (fails with EEXIST
  if the version was taken): optimistic concurrency.  A losing writer
  re-reads the head and retries against the next version — appends
  from concurrent writers serialize without locks.
- Old manifests stay: ``read(version=k)`` is time travel; compaction
  rewrites small files into large ones and publishes a new version
  whose LOGICAL content is unchanged (verified in tests); ``vacuum``
  deletes data unreferenced by any manifest (failed-writer garbage).

On an object store, ``os.link`` becomes put-if-absent /
conditional-PUT — the same primitive every production table format
uses; nothing else changes.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import one_slice_df

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    """Another writer published this version first (retryable)."""


class BatchIdRegression(RuntimeError):
    """A foreachBatch id went BACKWARDS past the replay window: the
    stream restarted from a fresh/reset checkpoint (ids restart at 0)
    while the table remembers a higher high-water mark.  Silently
    no-opping here would drop every new micro-batch — fail fast
    instead (review finding)."""


class _ManifestLog:
    """Shared manifest-log machinery: version numbering, atomic
    put-if-absent publish, invisible staging, vacuum.  Subclasses
    define the manifest payload shape via ``_manifest_files``."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(root, _DATA_DIR), exist_ok=True)

    @staticmethod
    def _manifest_files(manifest: dict) -> list[str]:
        raise NotImplementedError

    # -- manifest log ------------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _MANIFEST_DIR, f"v{version:08d}.json")

    def current_version(self) -> int:
        """Highest published version (0 = empty table)."""
        names = [n for n in os.listdir(os.path.join(self.root, _MANIFEST_DIR))
                 if n.startswith("v") and n.endswith(".json")]
        return max((int(n[1:9]) for n in names), default=0)

    def _load(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def _publish(self, manifest: dict, version: int) -> None:
        """Atomic publish: exclusive-create via link (put-if-absent)."""
        tmp = os.path.join(self.root, _MANIFEST_DIR,
                           f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as e:
            raise CommitConflict(f"version {version} already published") from e
        finally:
            os.unlink(tmp)

    # -- write paths -------------------------------------------------------

    def _stage(self, df: DataFrame) -> tuple[list[str], str]:
        """Write df's files under a unique staging dir; return (files,
        schema json).  Staged files are invisible until a manifest
        names them."""
        stage = os.path.join(self.root, _DATA_DIR, uuid.uuid4().hex)
        df.write.parquet(stage)
        files = sorted(
            os.path.join(stage, n) for n in os.listdir(stage)
            if n.endswith(".parquet"))
        return files, df.schema.json()

    @staticmethod
    def _file_rows(files: list[str]) -> int:
        """Row count from parquet FOOTERS — driver-side pyarrow
        metadata reads, no Spark job (the commit-time statistics a
        lakehouse manifest carries so `COUNT(*)`-grade questions never
        scan data; at 100 TB a count job is real money, a footer read
        is microseconds per file)."""
        import pyarrow.parquet as pq
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    # -- maintenance -------------------------------------------------------

    def vacuum(self, min_age_seconds: float = 3600.0) -> list[str]:
        """Delete staged data unreferenced by ANY manifest — the
        garbage failed or superseded writers left.  Returns removed
        paths.

        ``min_age_seconds`` is the stage-to-publish grace window: a
        CONCURRENT writer that has staged but not yet published has
        unreferenced files too, and deleting them would corrupt the
        version it is about to publish (review finding) — so only
        files older than the window are eligible.  One hour dwarfs
        any real stage-to-publish gap; pass 0 only when no writer can
        be in flight.  (Production formats pair this with a retention
        window for readers of old versions; every manifest here pins
        its files forever until its deletion.)"""
        import shutil
        import time as _time
        referenced: set[str] = set()
        for v in range(1, self.current_version() + 1):
            if os.path.exists(self._manifest_path(v)):
                referenced.update(self._manifest_files(self._load(v)))
        removed = []
        now = _time.time()
        data_root = os.path.join(self.root, _DATA_DIR)
        for stage in os.listdir(data_root):
            sdir = os.path.join(data_root, stage)
            if not os.path.isdir(sdir):
                continue  # stray plain file under data/ — not ours
            entries = [os.path.join(sdir, n) for n in os.listdir(sdir)]
            parquet = [p for p in entries if p.endswith(".parquet")]
            live = [p for p in parquet if p in referenced]
            if live:
                # dir still backs a version: drop only unreferenced
                # parquet, keep Spark's _SUCCESS/.crc sidecars with it
                for p in parquet:
                    if (p not in referenced
                            and now - os.path.getmtime(p) >= min_age_seconds):
                        os.unlink(p)
                        removed.append(p)
            elif all(now - os.path.getmtime(p) >= min_age_seconds
                     for p in entries):
                # no manifest references anything here and everything
                # is past the grace window: remove the whole stage dir
                # (sidecars included — per-file unlink left them
                # pinning empty dirs forever, review finding)
                removed.extend(parquet)
                shutil.rmtree(sdir)
        return removed

    def expire_versions(self, keep_last: int = 2) -> list[int]:
        """Retention: delete the manifests of all but the newest
        ``keep_last`` versions (Iceberg's expire-snapshots analog).
        Time travel below the floor (``current - keep_last + 1``)
        stops working; a following ``vacuum`` then frees the files
        ONLY expired manifests referenced.  Files an expired version
        shares with a retained one stay live automatically — append
        carry-forward, merge-on-read overlay bases, and replace
        passes all publish manifests that re-reference the untouched
        files, so reference-safety is resolved from the RETAINED
        manifests, never from file age (the min-age grace window in
        ``vacuum`` protects in-flight writers, not old readers).

        Returns the expired version numbers.  Conventions a caller
        must hold:

        * ``keep_last >= 1`` (the head is never expirable);
        * an OVERLAY catalog (rebalance-style: deltas at head resolve
          against an earlier version via ``read(version=...)``) must
          keep its floor at or below the overlay base — expire only
          below the oldest version any live reader names explicitly;
        * never expire-and-vacuum a SOURCE catalog whose shallow
          clones are alive: clone references live in OTHER catalogs'
          manifests, invisible to this one (same caveat as
          ``clone_pass``)."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        head = self.current_version()
        expired = []
        for v in range(1, max(head - keep_last + 1, 1)):
            path = self._manifest_path(v)
            if os.path.exists(path):
                os.unlink(path)
                expired.append(v)
        return expired


class ManifestTable(_ManifestLog):
    """Single-table manifest log: append / time travel / compaction /
    exactly-once streaming sink."""

    @staticmethod
    def _manifest_files(manifest: dict) -> list[str]:
        return manifest.get("files", [])

    def append(self, df: DataFrame, max_retries: int = 10) -> int:
        """Atomically append: stage files once, then CAS the manifest
        (retrying against new heads — staged data never rewrites).
        Returns the published version.

        Schema evolution is ADDITIVE name-based: the published
        manifest carries the appended df's schema, and older files
        null-fill any new columns at read time (parquet name
        resolution).  Dropping, renaming, or retyping a column
        requires a rewrite (compact with a projected df) — the same
        contract production formats enforce without column mapping."""
        files, schema = self._stage(df)
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head) if head else {}
            try:
                self._publish({"schema": schema,
                               "files": prev.get("files", []) + files,
                               "parent": head,
                               # carry the streaming high-water mark —
                               # dropping it would un-protect the sink's
                               # replay detection (review finding)
                               "last_batch_id": prev.get("last_batch_id")},
                              head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def merge(self, spark: SparkSession, updates: DataFrame, key: str,
              max_retries: int = 10) -> int:
        """MERGE INTO (upsert) — the remaining lakehouse verb after
        append/compact/vacuum/time-travel: rows in ``updates`` replace
        current rows with the same ``key`` (WHEN MATCHED UPDATE SET *),
        unmatched update rows insert (WHEN NOT MATCHED INSERT *).

        Copy-on-write snapshot semantics: the merged content is staged
        as NEW files and published as one atomic version — a reader
        sees the old snapshot or the new one, never a mix, and time
        travel to the pre-merge version keeps working.  On a commit
        race the merge recomputes against the new head (staged files
        from the lost round become vacuum-eligible orphans).  The
        merge itself is the left-anti + union plan of
        operators/pipeline.merge_upsert — one shuffle on the key.

        Precondition (same as Delta's MERGE ambiguity rule): ``updates``
        must carry at most one row per ``key`` — duplicate update keys
        all insert, leaving the table multi-rowed for that key.
        Deduplicate upstream (e.g. first_touch/last-write row_number)
        when the source is a raw CDC feed."""
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head) if head else {}
            merged = self._merged(spark, head, updates, key)
            files, schema = self._stage(merged)
            try:
                self._publish({"schema": schema, "files": files,
                               "parent": head, "merge_of": head,
                               "last_batch_id": prev.get("last_batch_id")},
                              head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def _merged(self, spark: SparkSession, head: int, updates: DataFrame,
                key: str) -> DataFrame:
        """The one MERGE plan (left-anti + unionByName against the
        ``head`` snapshot) shared by :meth:`merge` and
        :meth:`merge_batch` — a semantics fix lands in both paths."""
        current = self.read(spark, head)
        if head == 0 or not current.columns:
            return updates
        return (current
                .join(updates.select(key).distinct(), on=key,
                      how="left_anti")
                .unionByName(updates))

    def compact(self, spark: SparkSession, target_files: int = 1) -> int:
        """Rewrite the current content into ``target_files`` files and
        publish a version with identical logical content (the
        small-files remedy; old versions remain time-travelable)."""
        head = self.current_version()
        df = self.read(spark, head).coalesce(target_files)
        files, schema = self._stage(df)
        prev = self._load(head) if head else {}
        self._publish({"schema": schema, "files": files, "parent": head,
                       "compaction_of": head,
                       "last_batch_id": prev.get("last_batch_id")}, head + 1)
        return head + 1

    def optimize(self, spark: SparkSession, zorder_cols: list[str],
                 target_files: int = 16, bits: int = 8) -> int:
        """OPTIMIZE ZORDER: rewrite the current content laid out along
        a Morton curve over two numeric columns and publish as one
        atomic version — Delta's OPTIMIZE ZORDER expressed on the
        manifest log.  Logical content is identical (pytest-pinned);
        what changes is file-level min/max tightness on BOTH columns,
        so multi-dimensional range scans prune files (a single-column
        sort leaves the second column's per-file span at 100%).

        Binning is range-based (min/max from one bounded aggregate —
        two driver scalars, never rows): modulo binning would scramble
        value order and destroy prunability.  Write path is ONE range
        shuffle (`repartitionByRange` on the z-value) + in-partition
        sort.  Old versions stay time-travelable; superseded files
        fall to vacuum."""
        cx, cy = zorder_cols
        head = self.current_version()
        df = self.read(spark, head)
        if head == 0 or not df.columns:
            return head  # empty table: nothing to lay out (no-op,
            #              matching compact()'s tolerance — review finding)
        lo_x, hi_x, lo_y, hi_y = df.agg(
            F.min(cx), F.max(cx), F.min(cy), F.max(cy)).first()
        if lo_x is None or lo_y is None:
            return head  # zero rows: same no-op
        n_bins = 1 << bits

        def bucket(col: str, lo, hi) -> "F.Column":
            span = float(hi) - float(lo)
            if span <= 0:
                return F.lit(0)
            return F.least(
                F.floor((F.col(col) - F.lit(float(lo)))
                        / F.lit(span / n_bins)).cast("int"),
                F.lit(n_bins - 1))

        xb, yb = bucket(cx, lo_x, hi_x), bucket(cy, lo_y, hi_y)
        z = F.lit(0)
        for i in range(bits):
            z = (z
                 + F.shiftleft(
                     F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
                 + F.shiftleft(
                     F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i))
        laid = (df.withColumn("__z", z)
                .repartitionByRange(target_files, "__z")
                .sortWithinPartitions("__z")
                .drop("__z"))
        files, schema = self._stage(laid)
        prev = self._load(head) if head else {}
        self._publish({"schema": schema, "files": files, "parent": head,
                       "optimize_of": head,
                       "last_batch_id": prev.get("last_batch_id")},
                      head + 1)
        return head + 1

    # -- read paths --------------------------------------------------------

    def row_count(self, version: int | None = None) -> int:
        """Row count from parquet footers (driver-side pyarrow; no
        Spark job) — see ManifestCatalog.row_count for why this is the
        at-scale shape for count-grade monitoring."""
        v = self.current_version() if version is None else version
        if v == 0:
            return 0
        return self._file_rows(self._load(v)["files"])

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read a table version (default: head).  Files come from the
        manifest, never a directory listing — in-flight writers are
        invisible."""
        v = self.current_version() if version is None else version
        if v == 0:
            return spark.createDataFrame(
                [], T.StructType([]))
        m = self._load(v)
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        if not m["files"]:
            return one_slice_df(spark, [], schema)
        return spark.read.schema(schema).parquet(*m["files"])

    # -- streaming ---------------------------------------------------------

    def append_batch(self, df: DataFrame, batch_id: int,
                     max_retries: int = 10) -> int | None:
        """Idempotent append for ``foreachBatch``: the manifest keeps
        the writer's HIGH-WATER batch id, so a RETRIED micro-batch
        (failure after publish, before the streaming checkpoint
        committed) sees ``batch_id <= last_batch_id`` and no-ops
        instead of double-appending.  This + staged-invisible files =
        an exactly-once streaming sink on plain parquet.  A scalar
        high-water mark (not a set of every id) keeps manifests O(1)
        in stream length; it is sufficient because foreachBatch only
        ever retries the LATEST uncommitted batch — so only
        ``batch_id == last`` is a legitimate replay.  ``batch_id <
        last`` can only mean the checkpoint was reset (ids restart at
        0): no-opping would silently discard every new micro-batch,
        so it raises :class:`BatchIdRegression` instead.  Contract:
        ONE streaming query per table; to restart from a fresh
        checkpoint, start a fresh table.  ``append``/``compact``
        carry the mark forward.  Returns the published version, or
        None when the batch was already committed."""
        staged: tuple[list[str], str] | None = None  # stage once per call
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head) if head else {}
            last = prev.get("last_batch_id")
            if last is not None and batch_id == last:
                return None  # retried batch — already durable, no-op
            if last is not None and batch_id < last:
                raise BatchIdRegression(
                    f"batch_id {batch_id} < table high-water mark {last}: "
                    "the streaming checkpoint was reset; writing would "
                    "silently drop data — use a fresh table")
            if staged is None:
                staged = self._stage(df)
            files, schema = staged
            try:
                self._publish({"schema": schema,
                               "files": prev.get("files", []) + files,
                               "parent": head,
                               "last_batch_id": batch_id},
                              head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def foreach_batch_writer(self):
        """``writeStream.foreachBatch(tbl.foreach_batch_writer())``."""
        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.append_batch(batch_df, int(batch_id))
        return write

    def merge_batch(self, spark: SparkSession, df: DataFrame, key: str,
                    batch_id: int, max_retries: int = 10) -> int | None:
        """Idempotent MERGE for ``foreachBatch`` — the streaming CDC
        upsert sink (each micro-batch carries the latest row per key;
        matched keys replace, new keys insert).  Replay protection is
        the same high-water contract as :meth:`append_batch`:
        ``batch_id == last`` no-ops (the merge already published —
        re-merging a batch whose rows bump values would double-apply),
        ``batch_id < last`` raises :class:`BatchIdRegression`.
        Copy-on-write staging happens AFTER the replay check, so a
        retried batch stages nothing."""
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head) if head else {}
            last = prev.get("last_batch_id")
            if last is not None and batch_id == last:
                return None
            if last is not None and batch_id < last:
                raise BatchIdRegression(
                    f"batch_id {batch_id} < table high-water mark {last}: "
                    "the streaming checkpoint was reset; writing would "
                    "silently drop data — use a fresh table")
            merged = self._merged(spark, head, df, key)
            # merged content depends on the head — restage per attempt
            files, schema = self._stage(merged)
            try:
                self._publish({"schema": schema, "files": files,
                               "parent": head, "merge_of": head,
                               "last_batch_id": batch_id},
                              head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def fold_batch(self, spark: SparkSession, partial: DataFrame,
                   derive, batch_id: int,
                   max_retries: int = 10) -> int | None:
        """Read-fold-publish for ``foreachBatch`` where the written
        content DERIVES from the current table content (incremental
        materialized views): ``derive(head_df, partial)`` must return
        the full new artifact.  The read+fold runs INSIDE the commit-
        retry loop against the pinned head version, so a lost publish
        race recomputes the fold from the NEW head instead of
        re-staging stale totals (ADVICE r4: the maintenance writer
        folded outside the loop, which silently lost concurrent
        updates).  Replay protection is the same high-water contract
        as :meth:`merge_batch`: ``batch_id == last`` no-ops,
        ``batch_id < last`` raises :class:`BatchIdRegression`."""
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head) if head else {}
            last = prev.get("last_batch_id")
            if last is not None and batch_id == last:
                return None
            if last is not None and batch_id < last:
                raise BatchIdRegression(
                    f"batch_id {batch_id} < table high-water mark {last}: "
                    "the streaming checkpoint was reset; writing would "
                    "silently drop data — use a fresh table")
            merged = derive(self.read(spark, head), partial)
            files, schema = self._stage(merged)
            try:
                self._publish({"schema": schema, "files": files,
                               "parent": head, "fold_of": head,
                               "last_batch_id": batch_id},
                              head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def foreach_batch_merger(self, spark: SparkSession, key: str):
        """``writeStream.foreachBatch(tbl.foreach_batch_merger(spark,
        "id"))`` — exactly-once streaming upsert."""
        def write(batch_df: DataFrame, batch_id: int) -> None:
            self.merge_batch(spark, batch_df, key, int(batch_id))
        return write


class ManifestCatalog(_ManifestLog):
    """MULTI-table atomic publish: one manifest version names the file
    set of EVERY table, so an N-table pass commits with ONE
    put-if-absent — the reference's one-transaction-per-ingest-pass
    (core.rs:59-61, 70-72: a crashed run publishes NOTHING, never a
    partial table set) re-expressed for files + object storage.  The
    table-per-type fan-out sink (A4) composes with this: stage all
    per-type files, then a single commit makes the whole pass visible.

    Manifest shape: ``{"tables": {name: {"schema": ..., "files":
    [...]}}, "parent": v}``.  A pass APPENDS to the tables it names
    and carries every other table forward unchanged, so independent
    passes over disjoint table sets serialize without interference.
    Tables named in ``replace`` instead get the new file set ONLY —
    the overwrite transaction every table format pairs with append
    (needed when maintenance is an ordered merge that DISPLACES
    committed rows, e.g. prune-on-append for a top-m postings
    artifact).  Replaced files stay referenced by older manifests, so
    time travel and vacuum safety are unchanged."""

    @staticmethod
    def _manifest_files(manifest: dict) -> list[str]:
        return [f for t in manifest.get("tables", {}).values()
                for f in t["files"]]

    def publish_pass(self, tables: dict[str, DataFrame],
                     max_retries: int = 10,
                     replace: frozenset[str] | set[str] = frozenset(),
                     expected_parent: int | None = None) -> int:
        """Stage EVERY table's files first (all invisible), then CAS
        one manifest naming them all.  Any failure before the publish
        leaves only unreferenced staging garbage — readers never see
        a subset of the pass.  Returns the published version.

        ``expected_parent`` pins the CAS to one specific head: if any
        other writer published first, raise :class:`CommitConflict`
        immediately instead of retrying on top of the NEW head.  A
        caller whose staged content DERIVES from what it read at
        ``expected_parent`` (compact_pass) must use this — the
        default retry loop would REPLACE-publish the stale read and
        silently drop the concurrent writer's rows (ADVICE r9; same
        lost-update shape fold_batch closes by recomputing inside
        its loop)."""
        staged = {name: self._stage(df) for name, df in tables.items()}
        staged_rows = {name: self._file_rows(files)
                       for name, (files, _) in staged.items()}
        for _ in range(1 if expected_parent is not None else max_retries):
            head = (self.current_version() if expected_parent is None
                    else expected_parent)
            prev = self._load(head).get("tables", {}) if head else {}
            merged = dict(prev)
            for name, (files, schema) in staged.items():
                if name in replace:
                    old, old_rows = [], 0
                else:
                    p = prev.get(name, {})
                    old = p.get("files", [])
                    # pre-rows manifests lack the key: recompute once
                    # from footers, after which it sticks.  The key
                    # test must be explicit — dict.get evaluates its
                    # default EAGERLY, which would re-read every
                    # carried-forward footer on every append publish
                    # (review finding).
                    if "rows" in p:
                        old_rows = p["rows"]
                    else:
                        old_rows = self._file_rows(old) if old else 0
                merged[name] = {"schema": schema, "files": old + files,
                                "rows": old_rows + staged_rows[name]}
            try:
                self._publish({"tables": merged, "parent": head}, head + 1)
                return head + 1
            except CommitConflict:
                continue
        if expected_parent is not None:
            # one pinned attempt, not a retry loop — a generic "lost
            # N races" here would misreport the CAS contract (ADVICE
            # r10): the caller must re-derive from the new head.
            raise CommitConflict(
                f"head moved past expected_parent={expected_parent}: "
                "re-derive staged content from the new head and retry")
        raise CommitConflict(f"lost {max_retries} publish races")

    def clone_pass(self, src: "ManifestCatalog",
                   version: int | None = None,
                   max_retries: int = 10) -> int:
        """SHALLOW CLONE: publish a version whose tables reference the
        SOURCE catalog's committed files verbatim — zero data copied,
        one atomic manifest write (the Delta/Iceberg shallow-clone
        primitive).  Used to snapshot a live index before maintenance
        rewrites part of it: the clone's v1 is the pre-maintenance
        index at zero cost, and later passes on the clone never touch
        the source.  Caveat (same as every shallow clone): the SOURCE
        catalog's vacuum does not know about clone references — don't
        vacuum a source whose clones are still alive."""
        v = src.current_version() if version is None else version
        if v == 0:
            # A never-published source has no manifest file at all;
            # without this guard the _load(0) below surfaces as a
            # bare FileNotFoundError for a path that never existed
            # (round-9 ADVICE — the primitive is public).
            raise ValueError(
                f"cannot clone an empty catalog: {src.root!r} has no "
                "published version")
        tables = src._load(v)["tables"]
        for _ in range(max_retries):
            head = self.current_version()
            prev = self._load(head).get("tables", {}) if head else {}
            merged = dict(prev)
            merged.update({name: dict(t) for name, t in tables.items()})
            try:
                self._publish({"tables": merged, "parent": head}, head + 1)
                return head + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def table_names(self, version: int | None = None) -> list[str]:
        v = self.current_version() if version is None else version
        if v == 0:
            return []
        return sorted(self._load(v)["tables"])

    def row_count(self, table: str, version: int | None = None) -> int:
        """Commit-time row count — answered from the manifest (or, for
        manifests published before the statistic existed, one pyarrow
        footer sweep), NEVER a data scan.  The lakehouse property that
        makes `COUNT(*)`-grade monitoring free at 100 TB."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise KeyError(f"table {table!r}: catalog is empty")
        t = self._load(v)["tables"].get(table)
        if t is None:
            raise KeyError(f"table {table!r} not in catalog version {v}")
        rows = t.get("rows")
        return self._file_rows(t["files"]) if rows is None else int(rows)

    def compact_pass(self, spark: SparkSession, table: str,
                     target_files: int = 1,
                     max_retries: int = 10) -> int:
        """Small-files remedy for catalogs (the ManifestTable.compact
        analog): appended and streaming-maintained artifacts
        accumulate one file set per pass; this rewrites ONE table's
        head content into ``target_files`` files and REPLACE-publishes
        it — content-invariant (row_count and values pinned in
        test_manifest), with the superseded files draining through
        retention + vacuum like any replaced pass.  At 100 TB this is
        the scheduled OPTIMIZE that keeps per-file sizes at scan-task
        grain after heavy append churn.

        The read and the publish are one CAS unit (ADVICE r9): the
        content staged derives from the head READ HERE, so the
        publish pins ``expected_parent`` to that head and a lost race
        re-reads the NEW head instead of REPLACE-publishing the stale
        pre-append content (which would silently drop concurrent
        appends — the fold_batch lost-update shape)."""
        for _ in range(max_retries):
            head = self.current_version()
            df = self.read(spark, table, version=head) \
                     .coalesce(target_files)
            try:
                return self.publish_pass({table: df}, replace={table},
                                         expected_parent=head)
            except CommitConflict:
                continue
        raise CommitConflict(f"lost {max_retries} publish races")

    def apply_deletes_pass(self, spark: SparkSession,
                           drops: dict[str, tuple[str, DataFrame]],
                           tables: dict[str, DataFrame] | None = None,
                           replace: frozenset[str] | set[str] = frozenset(),
                           max_retries: int = 10,
                           expected_parent: int | None = None) -> int:
        """PHYSICAL deletion-vector application — the second phase of
        the two-phase erasure contract (Delta's REORG TABLE ... APPLY
        (PURGE) shape): for each table in ``drops`` (name → (key
        column, DataFrame of keys to drop)), rewrite ONLY the head
        files that CONTAIN a dropped key and re-reference every other
        file verbatim.  ``tables``/``replace`` publish extra tables
        (the emptied tombstone list, the decision artifact) in the
        SAME atomic manifest, so a crash mid-pass publishes nothing.

        Cost: one scan of each dropped-from table to locate affected
        files (index grain — cells/codes rows, never the vector
        corpus) + a rewrite of ONLY the affected files' rows; files
        without tombstoned rows ride forward byte-identical.  After
        ``expire_versions`` + ``vacuum`` on this (owning) catalog the
        superseded pre-rewrite files — the last physical copies of
        the tombstoned rows — are freed from disk (drilled in
        test_maintenance.py::test_dv_physical_erasure_frees_disk).

        Race contract (ADVICE r10): only the ``drops`` locate+rewrite
        re-derives from the head inside the retry loop — the
        caller-supplied ``tables`` DataFrames do NOT, so a caller
        whose extra tables derive from a head read (the leftover
        tombstone list, the decision) must pin ``expected_parent`` to
        that head and re-derive EVERYTHING on :class:`CommitConflict`
        (the compact_pass pattern; `_dv_rewrite_pass` does exactly
        this).  The default retry loop is only safe when ``tables``
        is head-independent."""
        from urllib.parse import urlparse

        tables = tables or {}
        for _ in range(1 if expected_parent is not None else max_retries):
            head = (self.current_version() if expected_parent is None
                    else expected_parent)
            prev = self._load(head).get("tables", {}) if head else {}
            merged = dict(prev)
            for name, (key, drop_df) in drops.items():
                t = prev.get(name)
                if t is None:
                    raise KeyError(f"table {name!r} not in catalog "
                                   f"version {head}")
                schema = T.StructType.fromJson(json.loads(t["schema"]))
                drop_b = F.broadcast(drop_df.select(key))
                scan = (spark.read.schema(schema).parquet(*t["files"])
                        .withColumn("_file", F.input_file_name()))
                # ≤ len(files) rows (bounded): the distinct files
                # holding at least one dropped key
                affected = {urlparse(r._file).path for r in
                            scan.join(drop_b, key, "left_semi")
                                .select("_file").distinct().collect()}
                if not affected:
                    continue            # table carries no dropped keys
                kept = [f for f in t["files"] if f not in affected]
                rewritten = (spark.read.schema(schema)
                             .parquet(*sorted(affected))
                             .join(drop_b, key, "left_anti"))
                new_files, _ = self._stage(rewritten)
                files = kept + new_files
                merged[name] = {"schema": t["schema"], "files": files,
                                "rows": self._file_rows(files)}
            for name, df in tables.items():
                files, schema_json = self._stage(df)
                if name in replace or name not in prev:
                    old, old_rows = [], 0
                else:
                    p = prev[name]
                    old = p.get("files", [])
                    old_rows = (p["rows"] if "rows" in p
                                else self._file_rows(old) if old else 0)
                merged[name] = {"schema": schema_json,
                                "files": old + files,
                                "rows": old_rows + self._file_rows(files)}
            try:
                self._publish({"tables": merged, "parent": head}, head + 1)
                return head + 1
            except CommitConflict:
                continue
        if expected_parent is not None:
            raise CommitConflict(
                f"head moved past expected_parent={expected_parent}: "
                "re-derive drops/tables from the new head and retry")
        raise CommitConflict(f"lost {max_retries} publish races")

    def read(self, spark: SparkSession, table: str,
             version: int | None = None) -> DataFrame:
        """Read one table at a catalog version (default: head)."""
        v = self.current_version() if version is None else version
        if v == 0:
            raise KeyError(f"table {table!r}: catalog is empty")
        t = self._load(v)["tables"].get(table)
        if t is None:
            raise KeyError(f"table {table!r} not in catalog version {v}")
        schema = T.StructType.fromJson(json.loads(t["schema"]))
        if not t["files"]:
            return one_slice_df(spark, [], schema)
        return spark.read.schema(schema).parquet(*t["files"])
