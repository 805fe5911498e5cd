"""Snapshot-committed tables: atomic batch maintenance over parquet.

:func:`~.tables.merge_upsert` / :func:`~.tables.delete_keys` rewrite
hive partitions IN PLACE (dynamic overwrite, then an explicit drop of
emptied directories) — correct semantics for a single writer that
never crashes, but a crash between the two steps, or a reader listing
the directory mid-overwrite, observes a mixed table state. At 100 TB
with concurrent jobs that is not an edge case; the fix is the standard
one every table format (Iceberg/Delta/Hudi) converged on, rebuilt here
from plain parquet + one manifest file:

- **Data files are immutable.** Every commit writes NEW files under
  ``<path>/data/<hive partition dirs>/<commit-uuid>-part-*.parquet``;
  nothing a published snapshot references is ever modified or deleted
  by a commit (only :func:`snapshot_prune` removes files, and only
  ones no retained snapshot references).
- **A snapshot is a manifest**, ``<path>/_manifests/<version>.json``:
  the list of data files (with their hive partition dir) that make up
  the table at that version. A partition-granular upsert/delete
  carries forward the untouched partitions' entries BY REFERENCE and
  lists new files only for rewritten partitions — commit cost is the
  affected partitions, exactly like the in-place path, but crash-safe.
- **Publishing is ONE atomic manifest commit** through a PLUGGABLE
  :class:`CommitStrategy` (r7). The default, :class:`RenameCommit`,
  writes the manifest to a hidden temp name and renames it to
  ``<version>.json``. Readers resolve ``max(version)`` over the
  manifest directory, so a half-written commit is invisible (the temp
  name never matches) and a crash anywhere before the rename leaves
  only unreferenced garbage files. The rename also provides
  optimistic concurrency: two writers racing to commit the same
  version — rename-to-existing fails — produce one winner and one
  clean ``ConcurrentCommit`` error, never interleaved state.

  **Failure matrix** (which strategy is safe where):

  ========================  ==============  ==============  ====================
  store                     RenameCommit    LockFileCommit  ConditionalPutCommit
  ========================  ==============  ==============  ====================
  HDFS                      safe            safe            n/a [3]_
  LocalFileSystem (POSIX)   safe            safe            n/a [3]_
  RawLocalFileSystem        UNSAFE [1]_     safe            n/a [3]_
  S3A (S3 proper)           UNSAFE [2]_     UNSAFE [2]_     safe
  ========================  ==============  ==============  ====================

  .. [1] rename() silently overwrites an existing destination, so the
     one-winner guarantee degrades to last-writer-wins — use
     :class:`LockFileCommit`, whose CAS is ``create(path,
     overwrite=false)`` (exclusive create), with the version-existence
     check serialized under the lock.
  .. [2] S3 rename is copy+delete and exclusive-create is emulated
     with a HEAD-then-PUT race; neither strategy's CAS holds. Use
     :class:`ConditionalPutCommit` (r8): its CAS is the store's OWN
     conditional primitive (S3 ``If-None-Match: *`` PUT, GCS
     ``ifGenerationMatch=0``, Azure ``If-None-Match``), so the
     manifest publish is one atomic service-side create-if-absent —
     no rename, no lock file. Alternatively front the MANIFEST
     DIRECTORY (tiny — the data files are fine on S3) with HDFS/EFS.
  .. [3] works (the test shim proves it over local files) but
     pointless where rename/exclusive-create are already sound —
     it exists for stores where they aren't.
- **Readers are isolated**: :func:`read_snapshot` pins the file list
  at resolve time, so a query keeps reading its version's files even
  if newer versions commit mid-query; files stay on disk until
  :func:`snapshot_prune` drops versions past the retention window.

The reference's only comparable guarantee is Step-Functions execution
dedup around whole-pipeline runs (trigger.py:55-68) — nothing at the
storage layer.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import _hive_partition_dir

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


class ConcurrentCommit(RuntimeError):
    """Another writer published this version first; re-read the table
    state and retry the operation."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _write_text(spark: SparkSession, path: str, text: str) -> None:
    jvm, fs, jpath = _fs(spark, path)
    out = fs.create(jpath, False)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def _read_text(spark: SparkSession, path: str) -> str:
    jvm, fs, jpath = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


_HINT = "_latest_hint"


def _write_hint(spark: SparkSession, path: str, version: int) -> None:
    """Best-effort advisory pointer to the latest version — written
    AFTER the CAS publish, so it can lag (a resolve probes forward)
    but never gates correctness (any failure here is swallowed; a
    missing/corrupt hint falls back to the full listing)."""
    try:
        jvm, fs, _ = _fs(spark, path)
        mdir = f"{path}/{_MANIFEST_DIR}"
        tmp = f"{mdir}/.hint-{uuid.uuid4().hex}"
        _write_text(spark, tmp, str(version))
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        dst = jvm.org.apache.hadoop.fs.Path(f"{mdir}/{_HINT}")
        if fs.exists(dst):
            fs.delete(dst, False)
        if not fs.rename(src, dst):
            fs.delete(src, False)
    except Exception:  # noqa: BLE001 — advisory only
        pass


def latest_version(spark: SparkSession, path: str) -> int | None:
    """Highest published snapshot version, or None for an empty/new
    table. Resolution is O(1)+O(lag) on a hinted table (r7): the
    ``_latest_hint`` pointer names a known-published version and the
    resolver probes FORWARD with exists() calls until the first gap —
    at 10⁵ commits that is a handful of metadata ops, not a directory
    listing. Tables without a valid hint fall back to the full
    listing, where only fully-renamed ``<n>.json`` manifests are
    visible, so an in-flight commit can't be resolved either way."""
    jvm, fs, jdir = _fs(spark, f"{path}/{_MANIFEST_DIR}")
    if not fs.exists(jdir):
        return None
    hint_path = jvm.org.apache.hadoop.fs.Path(
        f"{path}/{_MANIFEST_DIR}/{_HINT}")
    if fs.exists(hint_path):
        try:
            v = int(_read_text(spark, f"{path}/{_MANIFEST_DIR}/{_HINT}"))
        except Exception:  # noqa: BLE001 — corrupt hint: fall back
            v = None
        if v is not None and fs.exists(jvm.org.apache.hadoop.fs.Path(
                f"{path}/{_MANIFEST_DIR}/{v}.json")):
            while fs.exists(jvm.org.apache.hadoop.fs.Path(
                    f"{path}/{_MANIFEST_DIR}/{v + 1}.json")):
                v += 1
            return v
    versions = []
    for st in fs.listStatus(jdir):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            try:
                versions.append(int(name[:-len(".json")]))
            except ValueError:
                continue
    return max(versions) if versions else None


def _load_manifest(spark: SparkSession, path: str, version: int) -> dict:
    return json.loads(_read_text(
        spark, f"{path}/{_MANIFEST_DIR}/{version}.json"))


class CommitStrategy:
    """The CAS point of the whole format, made pluggable (r7): a
    strategy's one job is to publish ``<version>.json`` such that
    exactly ONE writer wins each version (losers raise
    :class:`ConcurrentCommit`) and a crashed publish leaves no
    partially-visible manifest. Everything else — immutable data
    files, carry-by-reference manifests, reader pinning — is
    strategy-independent. See the module docstring's failure matrix
    for which strategy is safe on which store; adapters for real
    conditional primitives (S3 conditional PUT, a lock service)
    implement this one method."""

    def publish(self, spark: SparkSession, path: str, version: int,
                manifest: dict) -> None:
        raise NotImplementedError


class RenameCommit(CommitStrategy):
    """Default: write to a hidden temp name, rename to the final name.
    One winner iff the store's rename REFUSES an existing destination
    (HDFS, Hadoop LocalFileSystem — verified; RawLocalFileSystem
    overwrites, making this last-writer-wins there)."""

    def _rename(self, fs, src, dst) -> bool:
        # the one op whose semantics vary by store — overridable so
        # tests can inject overwrite-semantics shims
        return bool(fs.rename(src, dst))

    def publish(self, spark: SparkSession, path: str, version: int,
                manifest: dict) -> None:
        jvm, fs, _ = _fs(spark, path)
        mdir = f"{path}/{_MANIFEST_DIR}"
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(mdir))
        tmp = f"{mdir}/.tmp-{uuid.uuid4().hex}.json"
        _write_text(spark, tmp, json.dumps(manifest, sort_keys=True))
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        dst = jvm.org.apache.hadoop.fs.Path(f"{mdir}/{version}.json")
        if fs.exists(dst) or not self._rename(fs, src, dst):
            fs.delete(src, False)
            raise ConcurrentCommit(
                f"version {version} of {path} was published by another "
                f"writer; reload and retry")


#: Java exception classes that mean "destination already exists" for
#: an exclusive create, walked through the cause chain. Class-based
#: classification (not message substrings): Hadoop filesystems word
#: their messages differently, so a real FileAlreadyExists with
#: unusual text must still read as contention, and an unrelated
#: IOException that merely MENTIONS "exists" must not.
_EXISTS_EXC_CLASSES = frozenset((
    "org.apache.hadoop.fs.FileAlreadyExistsException",
    "org.apache.hadoop.fs.PathExistsException",
    "java.nio.file.FileAlreadyExistsException",
))


def _is_exists_error(e: BaseException) -> bool:
    je = getattr(e, "java_exception", None)
    if je is not None:
        seen = 0
        while je is not None and seen < 16:
            try:
                if je.getClass().getName() in _EXISTS_EXC_CLASSES:
                    return True
                je = je.getCause()
            except Exception:  # noqa: BLE001 — dead gateway mid-walk
                break
            seen += 1
        return False
    # non-py4j path (pure-Python filesystem shims in tests)
    return isinstance(e, FileExistsError)


class LockFileCommit(CommitStrategy):
    """For stores whose rename overwrites but whose
    ``create(path, overwrite=false)`` is a real exclusive create
    (POSIX O_EXCL semantics — RawLocalFileSystem, NFS): the writer
    takes a per-table lock file with exclusive create, checks the
    version doesn't exist, publishes (rename under the lock — its
    overwrite semantics no longer matter), and releases. A writer that
    crashes holding the lock leaves it behind; locks older than
    ``lock_timeout_seconds`` are broken (set it above the worst-case
    manifest write — the guarded section writes one small JSON, not
    data files, so seconds suffice; breaking is itself an exclusive
    create on a takeover marker so two breakers can't both win, and
    the marker has the SAME age-based expiry so a breaker that
    crashes between creating and deleting it can't wedge stale-lock
    recovery forever).

    Fencing (r8): every acquisition writes a unique token into the
    lock file, and ``publish`` re-verifies BOTH (a) the lock still
    holds our token and (b) ``<version>.json`` is still absent,
    immediately before the rename — so a holder stalled past
    ``lock_timeout_seconds`` (GC pause, NFS stall) whose lock was
    broken aborts with :class:`ConcurrentCommit` instead of renaming
    over the successor's already-published manifest. Release is
    likewise conditional on still owning the token (deleting a
    broken-and-reacquired lock would unlock the successor
    mid-publish). The residual window is the single rename call — the
    irreducible cost of emulating CAS on these stores; use
    :class:`ConditionalPutCommit` where a real conditional primitive
    exists."""

    def __init__(self, lock_timeout_seconds: float = 300.0):
        if lock_timeout_seconds <= 0:
            raise ValueError("lock_timeout_seconds must be > 0")
        self.lock_timeout_seconds = lock_timeout_seconds

    def _rename(self, fs, src, dst) -> bool:
        return bool(fs.rename(src, dst))

    def _try_create(self, spark, path: str, text: str) -> bool:
        """Exclusive create; False if the path already exists."""
        try:
            _write_text(spark, path, text)
            return True
        except Exception as e:  # noqa: BLE001 — py4j wraps the Java
            if _is_exists_error(e):
                return False
            raise

    def _age_ms(self, fs, jvm, path: str) -> float:
        import time
        try:
            return (time.time() * 1000.0
                    - fs.getFileStatus(
                        jvm.org.apache.hadoop.fs.Path(path))
                    .getModificationTime())
        except Exception:  # noqa: BLE001 — released between probes
            return 0.0

    def _owns(self, spark, fs, jvm, lock: str, token: str) -> bool:
        try:
            jlock = jvm.org.apache.hadoop.fs.Path(lock)
            return (fs.exists(jlock)
                    and _read_text(spark, lock) == token)
        except Exception:  # noqa: BLE001 — deleted between probes
            return False

    def _acquire(self, spark, fs, jvm, mdir: str) -> tuple[str, str]:
        lock = f"{mdir}/.commit-lock"
        jlock = jvm.org.apache.hadoop.fs.Path(lock)
        token = uuid.uuid4().hex
        if self._try_create(spark, lock, token):
            return lock, token
        timeout_ms = self.lock_timeout_seconds * 1000.0
        if self._age_ms(fs, jvm, lock) > timeout_ms:
            # break the stale lock via a takeover marker (exclusive
            # create — one breaker wins), then delete lock + marker
            # and retry the normal acquisition once
            marker = f"{lock}.takeover"
            jmarker = jvm.org.apache.hadoop.fs.Path(marker)
            got_marker = self._try_create(spark, marker, token)
            if not got_marker and self._age_ms(fs, jvm, marker) > timeout_ms:
                # a breaker crashed between creating and deleting the
                # marker; expire it by age so recovery isn't wedged
                # forever, then contend for the takeover again
                fs.delete(jmarker, False)
                got_marker = self._try_create(spark, marker, token)
            if got_marker:
                try:
                    fs.delete(jlock, False)
                finally:
                    fs.delete(jmarker, False)
                if self._try_create(spark, lock, token):
                    return lock, token
        raise ConcurrentCommit(
            f"commit lock {lock} is held by another writer; retry")

    def _publish_under_lock(self, spark, fs, jvm, mdir: str,
                            version: int, manifest: dict,
                            lock: str, token: str) -> None:
        dst = jvm.org.apache.hadoop.fs.Path(f"{mdir}/{version}.json")
        if fs.exists(dst):
            raise ConcurrentCommit(
                f"version {version} was published by another writer; "
                f"reload and retry")
        tmp = f"{mdir}/.tmp-{uuid.uuid4().hex}.json"
        _write_text(spark, tmp, json.dumps(manifest, sort_keys=True))
        src = jvm.org.apache.hadoop.fs.Path(tmp)
        # fencing: last-moment ownership + absence re-check (see class
        # docstring) — a stalled holder must lose here, not overwrite
        if not self._owns(spark, fs, jvm, lock, token) \
                or fs.exists(dst):
            fs.delete(src, False)
            raise ConcurrentCommit(
                f"commit lock for version {version} was broken while "
                f"stalled (held past lock_timeout_seconds="
                f"{self.lock_timeout_seconds}); nothing published — "
                f"reload and retry")
        if not self._rename(fs, src, dst):
            fs.delete(src, False)
            raise RuntimeError(
                f"failed to publish manifest {version}.json")

    def publish(self, spark: SparkSession, path: str, version: int,
                manifest: dict) -> None:
        jvm, fs, _ = _fs(spark, path)
        mdir = f"{path}/{_MANIFEST_DIR}"
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(mdir))
        lock, token = self._acquire(spark, fs, jvm, mdir)
        try:
            self._publish_under_lock(spark, fs, jvm, mdir, version,
                                     manifest, lock, token)
        finally:
            try:
                if self._owns(spark, fs, jvm, lock, token):
                    fs.delete(jvm.org.apache.hadoop.fs.Path(lock),
                              False)
            except Exception:  # noqa: BLE001 — release is best-effort
                pass


class ConditionalPutCommit(CommitStrategy):
    """For object stores with a REAL atomic create-if-absent
    primitive — S3 conditional PUT (``If-None-Match: *``), GCS
    ``ifGenerationMatch=0``, Azure Blob ``If-None-Match: *``. This is
    the strategy for S3 proper, the failure matrix's [2] row, where
    rename is copy+delete (overwrites) AND exclusive create is a
    HEAD-then-PUT race — the one combination that defeats both
    :class:`RenameCommit` and :class:`LockFileCommit`.

    ``publish`` is ONE conditional PUT of the final
    ``<version>.json`` body. The service-side precondition IS the
    CAS, so there is no temp file, no rename, and no lock file — the
    two unreliable primitives simply aren't used. Exactly one writer
    per version gets ``201``; every loser gets a precondition
    failure, surfaced as :class:`ConcurrentCommit`. Crash-safety is
    trivial: the PUT either happened atomically or it didn't.

    The byte transport is injected: ``put_if_absent(path, body) ->
    bool`` (True = created; False = the key already exists /
    precondition failed; transport errors raise). A boto3 adapter is
    a few lines::

        def s3_put_if_absent(path, body):
            bucket, key = path[len("s3a://"):].split("/", 1)
            try:
                boto3.client("s3").put_object(
                    Bucket=bucket, Key=key,
                    Body=body.encode("utf-8"), IfNoneMatch="*")
                return True
            except botocore.exceptions.ClientError as e:
                code = e.response["ResponseMetadata"]["HTTPStatusCode"]
                if code in (412, 409):   # PreconditionFailed / racing
                    return False
                raise

    (documentation, not shipped code — this environment has no cloud
    SDK; tests/test_snapshots.py exercises the strategy against an
    object-store shim with overwriting renames and non-exclusive
    creates where only the conditional-PUT endpoint is atomic, and
    shows the other two strategies silently lose a committed version
    there while this one keeps exactly one winner.)"""

    def __init__(self, put_if_absent):
        if not callable(put_if_absent):
            raise TypeError(
                "put_if_absent must be a callable(path, body) -> bool")
        self.put_if_absent = put_if_absent

    def publish(self, spark: SparkSession, path: str, version: int,
                manifest: dict) -> None:
        jvm, fs, _ = _fs(spark, path)
        mdir = f"{path}/{_MANIFEST_DIR}"
        # directory creation is a no-op on keyed object stores; needed
        # for the filesystem-backed test shim and mixed deployments
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(mdir))
        if not self.put_if_absent(f"{mdir}/{version}.json",
                                  json.dumps(manifest, sort_keys=True)):
            raise ConcurrentCommit(
                f"version {version} of {path} was published by another "
                f"writer (conditional PUT precondition failed); reload "
                f"and retry")


#: module default — swap with :func:`set_commit_strategy` when the
#: manifest directory lives on a store where rename overwrites
_COMMIT_STRATEGY: CommitStrategy = RenameCommit()


def set_commit_strategy(strategy: CommitStrategy) -> CommitStrategy:
    """Install the commit strategy every snapshot writer uses from now
    on; returns the previous one (so tests/callers can restore it)."""
    global _COMMIT_STRATEGY
    if not isinstance(strategy, CommitStrategy):
        raise TypeError(f"expected a CommitStrategy, got {strategy!r}")
    prev = _COMMIT_STRATEGY
    _COMMIT_STRATEGY = strategy
    return prev


def _monotonic_stamp(now: float, prev: float | None) -> float:
    """Commit-time authority for AS-OF (r10, r9 VERDICT item 5):
    the recorded stamp is ``max(prev + 1 µs, now)``, so history
    timestamps are strictly increasing in version even when a second
    writer's wall clock runs behind the first's — multi-writer clock
    skew can reorder ``time.time()`` but never the recorded stamps,
    and as-of resolution by timestamp always agrees with commit
    order."""
    if prev is not None and now <= prev:
        return prev + 1e-6
    return now


def _commit_manifest(spark: SparkSession, path: str, version: int,
                     manifest: dict) -> None:
    import time

    # commit wall-clock (r8) powers AS-OF time travel; stamped
    # monotonic vs the previous manifest (r10) so multi-writer clock
    # skew cannot reorder history vs timestamps. The VERSION remains
    # the authority on order; the stamp now provably agrees with it.
    if "committed_at" not in manifest:
        prev_ts = None
        if version > 0:
            try:
                prev_ts = _load_manifest(
                    spark, path, version - 1).get("committed_at")
            except Exception:
                prev_ts = None         # pruned/first: plain clock
        manifest["committed_at"] = _monotonic_stamp(time.time(),
                                                    prev_ts)
    _COMMIT_STRATEGY.publish(spark, path, version, manifest)
    _write_hint(spark, path, version)


# -- manifest segments (r7) -------------------------------------------------
# A manifest's file list is ``files`` (inline entries) plus ``segments``
# — references to immutable side files, each listing entries for a set
# of partitions. A commit that touches few partitions carries untouched
# SEGMENTS by reference (one ref per segment, not one entry per file),
# so manifest-write cost is O(affected partitions + roll threshold),
# not O(total files) — at 10⁶ files per snapshot the per-commit JSON
# stays kilobytes. Inline entries roll into a new segment once they
# exceed the threshold; segments a manifest stops referencing are
# garbage-collected by snapshot_prune with the same grace rule as data
# files.

_SEGMENT_ROLL = 512


def _write_segment(spark: SparkSession, path: str,
                   entries: list[dict]) -> dict:
    name = f"seg-{uuid.uuid4().hex}.segment"
    _write_text(spark, f"{path}/{_MANIFEST_DIR}/{name}",
                json.dumps({"files": entries}, sort_keys=True))
    return {"path": name, "n_entries": len(entries),
            "partitions": sorted({e["partition"] for e in entries})}


def _load_segment(spark: SparkSession, path: str, name: str) -> list[dict]:
    return json.loads(_read_text(
        spark, f"{path}/{_MANIFEST_DIR}/{name}"))["files"]


def _manifest_entries(spark: SparkSession, path: str,
                      m: dict) -> list[dict]:
    """The manifest's complete data-file entry list: inline ``files``
    plus every referenced segment's entries."""
    entries = list(m.get("files") or [])
    for seg in m.get("segments") or []:
        entries += _load_segment(spark, path, seg["path"])
    return entries


def _build_file_refs(spark: SparkSession, path: str, m_prev: dict,
                     aff: set[str], new_entries: list[dict]) -> dict:
    """The next manifest's ``{files, segments}``: previous segments
    disjoint from the affected partitions carry as REFERENCES; broken
    segments' surviving entries, surviving inline entries, and the new
    entries go inline — rolled into a fresh segment past the
    threshold. Entries for affected partitions are dropped (the caller
    rewrote those partitions into ``new_entries``)."""
    carried, inline = [], []
    for seg in (m_prev.get("segments") or []):
        if aff.isdisjoint(seg["partitions"]):
            carried.append(seg)
        else:
            inline += [e for e in _load_segment(spark, path, seg["path"])
                       if e["partition"] not in aff]
    inline += [e for e in (m_prev.get("files") or [])
               if e["partition"] not in aff]
    inline += new_entries
    if len(inline) > _SEGMENT_ROLL:
        rolled, inline = _roll_segments(spark, path, inline)
        carried = carried + rolled
    return {"files": inline, "segments": carried}


def _roll_segments(spark: SparkSession, path: str,
                   entries: list[dict]) -> tuple[list[dict], list[dict]]:
    """Roll inline entries into PARTITION-GROUPED segments: each
    partition's entries live in exactly one segment, groups close at
    the roll threshold, the sub-threshold tail stays inline. Grouping
    by partition is what makes carry-by-reference effective — a later
    commit touching one partition breaks one group, not a monolithic
    all-partitions blob."""
    by_part: dict[str, list[dict]] = {}
    for e in entries:
        by_part.setdefault(e["partition"], []).append(e)
    segments, group = [], []
    for part in sorted(by_part):
        group += by_part[part]
        if len(group) >= _SEGMENT_ROLL:
            segments.append(_write_segment(spark, path, group))
            group = []
    return segments, group


def _validate_stats_cols(df: DataFrame, stats_cols: list[str],
                         partition_cols: list[str]) -> None:
    from pyspark.sql.types import NumericType, StringType
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in stats_cols:
        if c in partition_cols:
            raise ValueError(
                f"stats column {c!r} is a partition column — partition "
                f"pruning already covers it; list data columns only")
        if c not in by_name:
            raise ValueError(f"stats column {c!r} not in the frame's "
                             f"columns {sorted(by_name)}")
        t = by_name[c]
        if not isinstance(t, (NumericType, StringType)):
            raise ValueError(
                f"stats column {c!r} has type {t.simpleString()}; "
                f"file-skipping stats support numeric and string columns "
                f"(cast timestamps to epoch numbers upstream)")


# -- bloom-filter zone maps (r8) --------------------------------------------
# Min/max stats prune RANGE predicates but are useless for point
# lookups on high-cardinality unsorted columns (every file's [min,max]
# spans the key space). A tiny per-file Bloom filter answers
# "could value v be in this file?" for = / IN — the standard companion
# every table format records next to min/max. The default 4096 bits x
# 7 hashes holds ~400 distinct values per file at <1% false-positive
# rate; size ``bloom_bits`` to the table's rows-per-file (~10 bits
# per distinct value keeps FP ~1%). File-skipping FPs only cost
# reading a file that was going to be read without blooms anyway;
# correctness never depends on the rate.
#
# The hash must be computable IDENTICALLY on executors at write time
# (over every row) and on the driver at prune time (over one literal):
# double-hashed CRC-32 over the value's canonical decimal/UTF-8 string
# — crc32 has a public fixed spec with bit-identical implementations
# in Spark (`F.crc32`) and Python (`zlib.crc32`), unlike Spark's
# internal xxhash64 seeding. Restricted to string and integral
# columns, whose canonical string form is unambiguous on both sides
# (floats' decimal rendering is not).

_BLOOM_BITS = 4096                   # default mask width (512 B hex)
_BLOOM_K = 7
_BLOOM_SALT = "#g"


def _bloom_positions(value, m_bits: int) -> list[int]:
    """Driver-side bit positions for a literal — mirrors
    :func:`_file_blooms`' executor-side expression exactly."""
    import zlib
    s = str(value)
    h1 = zlib.crc32(s.encode("utf-8"))
    h2 = zlib.crc32((s + _BLOOM_SALT).encode("utf-8"))
    return [(h1 + i * h2) % m_bits for i in range(_BLOOM_K)]


def _bloom_hex(positions, m_bits: int) -> str:
    mask = 0
    for p in positions:
        mask |= 1 << p
    return format(mask, f"0{m_bits // 4}x")


def _bloom_contains(hex_mask: str, value) -> bool:
    # the mask width rides in the hex length — a prune check needs no
    # side metadata, and tables re-sized mid-life stay self-describing
    # file by file
    mask = int(hex_mask, 16)
    m_bits = len(hex_mask) * 4
    return all(mask >> p & 1
               for p in _bloom_positions(value, m_bits))


def _validate_bloom_cols(df: DataFrame, bloom_cols: list[str],
                         partition_cols: list[str]) -> None:
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType, StringType,
    )
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for c in bloom_cols:
        if c in partition_cols:
            raise ValueError(
                f"bloom column {c!r} is a partition column — partition "
                f"pruning already covers it; list data columns only")
        if c not in by_name:
            raise ValueError(f"bloom column {c!r} not in the frame's "
                             f"columns {sorted(by_name)}")
        t = by_name[c]
        if not isinstance(t, (StringType, ByteType, ShortType,
                              IntegerType, LongType)):
            raise ValueError(
                f"bloom column {c!r} has type {t.simpleString()}; "
                f"bloom zone maps support string and integral columns "
                f"(their canonical string form is identical on "
                f"executors and the driver — floats' is not)")


def _file_blooms(spark: SparkSession, scratch: str,
                 bloom_cols: list[str],
                 m_bits: int) -> dict[str, dict[str, str]]:
    """Per-data-file bloom masks for ``bloom_cols``, keyed like
    :func:`_file_stats` by scratch-relative path. One column-pruned
    pass per bloom column: positions are exploded and
    ``collect_set``-aggregated per file (map-side partial dedup keeps
    the shuffle at <= _BLOOM_BITS ints per file per partition); the
    driver packs the set into the hex mask — the same
    metadata-bounded collect as the min/max stats."""
    from urllib.parse import unquote

    marker = "/" + scratch.rstrip("/").rsplit("/", 1)[1] + "/"
    out: dict[str, dict[str, str]] = {}
    for c in bloom_cols:
        sdf = (spark.read.option("basePath", scratch).parquet(scratch)
               .select(F.col(c), F.input_file_name().alias("_f")))
        s = F.col(c).cast("string")
        h1 = F.crc32(F.encode(s, "UTF-8"))
        h2 = F.crc32(F.encode(F.concat(s, F.lit(_BLOOM_SALT)),
                              "UTF-8"))
        arr = F.array(*[((h1 + F.lit(i) * h2) % F.lit(m_bits))
                        .cast("int") for i in range(_BLOOM_K)])
        pos = (sdf.where(F.col(c).isNotNull())
               .select("_f", F.explode(arr).alias("_p")))
        for r in pos.groupBy("_f").agg(
                F.collect_set("_p").alias("_ps")).collect():
            rel = unquote(r["_f"].split(marker, 1)[1])
            out.setdefault(rel, {})[c] = _bloom_hex(r["_ps"], m_bits)
    return out


def _file_stats(spark: SparkSession, scratch: str,
                stats_cols: list[str]) -> dict[str, dict]:
    """Per-data-file min/max for ``stats_cols``, keyed by the file's
    SCRATCH-RELATIVE path (partition dirs + basename — basenames alone
    collide: one write job names each task's file identically across
    hive partition dirs, ``lang=en/part-00000-<job>…`` vs
    ``lang=de/part-00000-<job>…``, and a basename-keyed map silently
    cross-wires partitions' stats into wrong pruning). ONE distributed
    column-pruned pass over the just-written scratch files, grouped on
    ``input_file_name()``; the collect is O(files x stats_cols)
    scalars — driver-side metadata, same bound as the partition-values
    collects elsewhere in this module."""
    from urllib.parse import unquote

    marker = "/" + scratch.rstrip("/").rsplit("/", 1)[1] + "/"
    sdf = (spark.read.option("basePath", scratch).parquet(scratch)
           .select(*stats_cols,
                   F.input_file_name().alias("_f")))
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in stats_cols:
        # null counts (r8) power IS [NOT] NULL skipping the way
        # min/max power comparisons
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}"),
                 F.count_if(F.col(c).isNull()).alias(f"_nl_{c}")]
    out: dict[str, dict] = {}
    for r in sdf.groupBy("_f").agg(*aggs).collect():
        rel = unquote(r["_f"].split(marker, 1)[1])
        out[rel] = {c: {"min": r[f"_mn_{c}"], "max": r[f"_mx_{c}"],
                        "nulls": r[f"_nl_{c}"], "rows": r["_rows"]}
                    for c in stats_cols}
    return out


def _write_data_files(spark: SparkSession, path: str, df: DataFrame,
                      partition_cols: list[str],
                      stats_cols: list[str] | None = None,
                      bloom_cols: list[str] | None = None,
                      bloom_bits: int | None = None) -> list[dict]:
    """Materialize ``df`` as immutable commit-scoped data files and
    return their manifest entries.

    The frame is written to a scratch dir (so Spark controls
    parallelism and hive layout), then each data file is renamed into
    ``data/<partition dirs>/<commit>-<name>`` — renames are metadata
    ops on a real filesystem, bounded by the files this commit
    produced and issued from a DRIVER-SIDE THREAD POOL (r7: a large
    compaction's 10⁴-10⁵ renames overlap instead of serializing on
    round-trip latency; directories are pre-created once per partition
    so the parallel phase is pure renames). Nothing is visible to
    readers until the manifest commit.

    With ``stats_cols`` (r7), each entry also carries per-file min/max
    for those columns — the zone map :func:`snapshot_scan` prunes
    with. Stats are computed from the scratch files in one distributed
    column-pruned pass before placement."""
    commit = uuid.uuid4().hex
    jvm, fs, _ = _fs(spark, path)
    scratch = f"{path}/_tmp/{commit}"
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(scratch)
    stats_by_rel: dict[str, dict] = {}
    if stats_cols:
        _validate_stats_cols(df, stats_cols, partition_cols)
        stats_by_rel = _file_stats(spark, scratch, stats_cols)
    blooms_by_rel: dict[str, dict] = {}
    bloom_tags: dict[str, str] = {}
    if bloom_cols:
        from pyspark.sql.types import StringType
        _validate_bloom_cols(df, bloom_cols, partition_cols)
        m_bits = bloom_bits or _BLOOM_BITS
        if m_bits % 4 or m_bits < 64:
            raise ValueError(
                f"bloom_bits must be a multiple of 4 >= 64, "
                f"got {m_bits}")
        blooms_by_rel = _file_blooms(spark, scratch, bloom_cols, m_bits)
        # type tag guards prune-time coercion: an int literal against
        # a string column ('05' = 5 is true under Spark coercion but
        # str(5) hashes differently) must KEEP the file, not prune it
        by_name = {f.name: f.dataType for f in df.schema.fields}
        bloom_tags = {c: ("s" if isinstance(by_name[c], StringType)
                          else "i") for c in bloom_cols}

    scratch_path = jvm.org.apache.hadoop.fs.Path(scratch)
    moves = []                               # (src Path, dst_rel, part)
    it = fs.listFiles(scratch_path, True)
    scratch_uri = fs.makeQualified(scratch_path).toString()
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        if name.startswith("_") or name.startswith("."):
            continue
        rel = p.toString()[len(scratch_uri):].lstrip("/")
        part_dir = rel.rsplit("/", 1)[0] if "/" in rel else ""
        dst_rel = (f"{part_dir}/{commit}-{name}" if part_dir
                   else f"{commit}-{name}")
        from urllib.parse import unquote
        moves.append((p, dst_rel, part_dir, unquote(rel),
                      int(st.getLen())))

    for d in {part for _, _, part, _, _ in moves}:
        fs.mkdirs(jvm.org.apache.hadoop.fs.Path(
            f"{path}/{_DATA_DIR}/{d}" if d else f"{path}/{_DATA_DIR}"))

    def _place(move):
        src, dst_rel, part, orig_rel, nbytes = move
        dst = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{_DATA_DIR}/{dst_rel}")
        if not fs.rename(src, dst):
            raise RuntimeError(f"failed to place data file {dst_rel}")
        # byte size travels in the manifest (r11) so streaming
        # admission control (maxBytesPerTrigger) never stats files
        # at plan time; absent in pre-r11 manifests (readers fall
        # back to a lazy stat)
        entry = {"path": dst_rel, "partition": part, "bytes": nbytes}
        st, bl = stats_by_rel.get(orig_rel), blooms_by_rel.get(orig_rel)
        if st is not None or bloom_cols:
            merged = {c: dict(d) for c, d in (st or {}).items()}
            for c in (bloom_cols or []):
                # absent from the aggregation = every row null for c:
                # the all-zero mask proves no point lookup can match
                d = merged.setdefault(c, {})
                d["bloom"] = (bl or {}).get(
                    c, _bloom_hex((), bloom_bits or _BLOOM_BITS))
                d["bloom_t"] = bloom_tags[c]
            entry["stats"] = merged
        return entry

    if len(moves) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(32, len(moves))) as pool:
            entries = list(pool.map(_place, moves))
    else:
        entries = [_place(m) for m in moves]
    fs.delete(scratch_path, True)
    return entries


def _read_files(spark: SparkSession, path: str, entries: list[dict],
                schema_json: str | None = None) -> DataFrame:
    """Read exactly the listed data files. With ``schema_json`` (the
    manifest's), the table schema is declared instead of inferred from
    one footer — after a schema evolution, files written before the
    new column existed read as NULL for it without needing the
    mergeSchema footer sweep."""
    files = [f"{path}/{_DATA_DIR}/{e['path']}" for e in entries]
    reader = spark.read.option("basePath", f"{path}/{_DATA_DIR}")
    if schema_json:
        from pyspark.sql.types import StructType
        reader = reader.schema(StructType.fromJson(json.loads(schema_json)))
    return reader.parquet(*files)


def snapshot_history(spark: SparkSession, path: str) -> list[dict]:
    """The table's commit log, oldest first: ``{"version",
    "committed_at", "n_files", "operation_schema"}`` per published
    snapshot — the audit surface time travel resolves against. Cost is
    one manifest read per version (metadata, not data); pruned
    versions are simply absent."""
    head = latest_version(spark, path)
    if head is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    jvm, fs, _ = _fs(spark, path)
    out = []
    for v in range(head + 1):
        jp = jvm.org.apache.hadoop.fs.Path(
            f"{path}/{_MANIFEST_DIR}/{v}.json")
        if not fs.exists(jp):
            continue                   # pruned past retention
        m = _load_manifest(spark, path, v)
        out.append({
            "version": v,
            "committed_at": m.get("committed_at"),
            "operation": m.get("operation"),
            "n_files": len(m.get("files") or [])
            + sum(s.get("n_entries", 0)
                  for s in (m.get("segments") or [])),
            "partition_cols": m.get("partition_cols"),
        })
    return out


def snapshot_version_for_source(spark: SparkSession, path: str,
                                source: str, batch_id: int) -> int:
    """The earliest version of this table whose recorded
    ``source_batch`` marker for ``source`` covers ``batch_id`` —
    "which version of the replica/view incorporates base commit N".
    Every exactly-once writer (``snapshot_append(source_batch=)``,
    ``snapshot_apply_changes``, and therefore the whole sync family:
    aggregate/join views use ``aggregate_sync:<table>`` /
    ``join_sync:<side>:<table>``, replicas ``replicate:<table>``)
    records the applied batch id atomically with the commit, so the
    answer comes from the manifests alone. Combine with
    ``read_snapshot(path, version=...)`` for CONSISTENT cross-view
    reads: pin several derived views to the same base version and
    query them together. Raises ``LookupError`` when no retained
    version covers the batch (consumer hasn't caught up, or the
    covering versions were pruned — retention must cover the lag)."""
    head = latest_version(spark, path)
    if head is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    jvm, fs, _ = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    vs = sorted(int(n[:-5]) for n in
                (st.getPath().getName()
                 for st in fs.listStatus(mdir))
                if n.endswith(".json") and n[:-5].isdigit())

    def covered(v: int) -> bool:
        srcs = _load_manifest(spark, path, v).get(
            "append_sources") or {}
        return srcs.get(source, -1) >= batch_id

    # one directory listing + O(log n) manifest reads: the recorded
    # marker is monotone in version (rollback is the one commit that
    # can dip it — after one, the boundary found here may be a LATER
    # covering version than the earliest, which still satisfies the
    # contract "a version that incorporates the batch")
    if not vs or not covered(vs[-1]):
        raise LookupError(
            f"no retained version of {path} covers {source!r} batch "
            f"{batch_id} (head={head}) — the consumer hasn't applied "
            f"it yet, or retention pruned the covering versions")
    lo, hi = 0, len(vs) - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if covered(vs[mid]):
            hi = mid
        else:
            lo = mid + 1
    return vs[lo]


def _latest_version_with_marker_at_most(spark: SparkSession,
                                        path: str, source: str,
                                        batch_id: int,
                                        base_path: str) -> int:
    """Largest retained version whose ``source`` marker is <=
    ``batch_id`` — the newest state of a consumer that incorporates
    NOTHING beyond base commit ``batch_id``. Markers are carried
    forward by every commit, so they're monotone in version (the
    rollback caveat of :func:`snapshot_version_for_source` applies
    here too).

    When even the consumer's EARLIEST version sits past ``batch_id``
    (its first sync happened later), it is still content-consistent
    iff every base commit in ``(batch_id, first_marker]`` was
    row-neutral (``compact``) — verified from the base manifests;
    anything else raises.  The same check guards the general branch
    (r10): when the selected version's marker sits BELOW
    ``batch_id`` — because ``snapshot_prune`` removed the
    intermediate consumer versions, or because the consumer's
    markers simply jumped over ``batch_id`` (it synced at base 4
    then 7 while the session needs 5) — every base commit in
    ``(marker, batch_id]`` must be compaction-only, else the
    returned state would silently miss real base commits."""
    jvm, fs, _ = _fs(spark, path)
    mdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_MANIFEST_DIR}")
    vs = sorted(int(n[:-5]) for n in
                (st.getPath().getName()
                 for st in fs.listStatus(mdir))
                if n.endswith(".json") and n[:-5].isdigit())

    def marker(v: int) -> int:
        srcs = _load_manifest(spark, path, v).get(
            "append_sources") or {}
        return srcs.get(source, -1)

    # UNMARKED versions are ineligible: a version predating the
    # consumer's first sync (e.g. a join view's empty bootstrap) is
    # NOT "consistent with base@B" — it's consistent with nothing.
    # Only versions that recorded a marker participate.
    marked = [(v, m) for v in vs if (m := marker(v)) >= 0]
    if not marked:
        raise LookupError(
            f"no retained version of {path} records a marker for "
            f"{source!r}")
    def _gap_is_row_neutral(lo_b: int, hi_b: int) -> bool:
        # every base commit in (lo_b, hi_b] must be a row-neutral
        # compaction for the states on either side to be equal
        for b in range(lo_b + 1, hi_b + 1):
            try:
                op = _load_manifest(spark, base_path, b).get(
                    "operation")
            except Exception:
                op = None                  # pruned: can't verify
            if op != "compact":
                return False
        return True

    m0v, m0 = marked[0]
    if m0 > batch_id:
        if _gap_is_row_neutral(batch_id, m0):
            return m0v                     # row-neutral gap
        raise LookupError(
            f"every retained version of {path} already incorporates "
            f"base commits beyond {source!r} batch {batch_id}, and "
            f"the gap is not compaction-only — no consistent state "
            f"exists (first marker {m0})")
    lo, hi = 0, len(marked) - 1
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if marked[mid][1] <= batch_id:
            lo = mid
        else:
            hi = mid - 1
    v, m = marked[lo]
    if m < batch_id and not _gap_is_row_neutral(m, batch_id):
        # no retained consumer version is consistent with
        # base@batch_id: either the consumer's markers jumped over
        # batch_id (it never synced at exactly that base version),
        # or snapshot_prune removed the version that did
        raise LookupError(
            f"the newest retained version of {path} with a "
            f"{source!r} marker <= {batch_id} sits at marker {m}, "
            f"and base commits in ({m}, {batch_id}] are not "
            f"compaction-only — the consumer either never synced at "
            f"base {batch_id} (markers jumped over it) or pruning "
            f"removed that version; no consistent state exists")
    return v


def snapshot_read_session(spark: SparkSession, base_path: str,
                          consumers: dict) -> dict:
    """Multi-table CONSISTENT reads (r9): pin a base table and N of
    its derived consumers (aggregate/join views, replicas, any
    ``source_batch`` writer) to one mutually consistent state — the
    **max common synced base**. ``consumers`` maps a name to
    ``(consumer_path, source_key)`` where ``source_key`` is the
    consumer's marker key (``aggregate_sync:<table>``,
    ``replicate:<table>``, ``join_sync:left:<table>``, …).

    The session resolves B = min over consumers of their latest
    applied base version, pins the base at version B, and pins each
    consumer at its newest version whose marker is <= B. A pinned
    consumer version whose marker sits BELOW B is accepted only
    after verifying (from the base manifests, r10) that every base
    commit it skipped was ROW-NEUTRAL (a compaction — which the
    sync family skips unread); a gap carrying real row changes
    (marker jumps, pruned consumer versions) refuses loudly. So
    every returned frame equals a from-scratch derivation of the
    base at B. All file lists resolve NOW (``read_snapshot`` pins at
    creation), so commits landing or syncs running DURING the
    session never change what it reads; only ``snapshot_prune``
    retention can invalidate it (keep retention over the session
    length). Returns ``{"base_version", "base", "versions",
    "frames"}`` with one DataFrame per consumer."""
    if not consumers:
        raise ValueError("consumers must name at least one consumer")
    marks: dict[str, int] = {}
    for name, (cpath, src) in consumers.items():
        head = latest_version(spark, cpath)
        if head is None:
            raise FileNotFoundError(
                f"no published snapshot under {cpath}")
        srcs = _load_manifest(spark, cpath, head).get(
            "append_sources") or {}
        if src not in srcs:
            raise LookupError(
                f"consumer {name!r} at {cpath} records no marker for "
                f"source {src!r} — has it ever synced?")
        marks[name] = srcs[src]
    base_v = min(marks.values())
    versions: dict[str, int] = {}
    frames: dict[str, DataFrame] = {}
    for name, (cpath, src) in consumers.items():
        v = _latest_version_with_marker_at_most(spark, cpath, src,
                                                base_v, base_path)
        versions[name] = v
        frames[name] = read_snapshot(spark, cpath, v)
    return {"base_version": base_v,
            "base": read_snapshot(spark, base_path, base_v),
            "versions": versions, "frames": frames}


def _resolve_as_of(spark: SparkSession, path: str, as_of) -> int:
    """Latest version whose ``committed_at`` is <= the cutoff
    (ISO-8601 string or epoch seconds). Versions without a recorded
    timestamp (pre-r8 tables) are treated as before any cutoff."""
    import datetime

    if isinstance(as_of, str):
        try:
            cutoff = float(as_of)          # "2500" / "2500.5" = epoch
        except ValueError:
            dt = datetime.datetime.fromisoformat(as_of)
            if dt.tzinfo is None:
                # naive strings read as UTC (the engine-wide
                # convention); an explicit offset is RESPECTED
                dt = dt.replace(tzinfo=datetime.timezone.utc)
            cutoff = dt.timestamp()
    else:
        cutoff = float(as_of)
    best = None
    for h in snapshot_history(spark, path):
        ts = h["committed_at"]
        if ts is None or ts <= cutoff:
            best = h["version"]
    if best is None:
        raise FileNotFoundError(
            f"no snapshot of {path} existed at or before {as_of}")
    return best


def read_snapshot(spark: SparkSession, path: str,
                  version: int | None = None, *,
                  as_of=None,
                  tag: str | None = None,
                  where: str | None = None) -> DataFrame:
    """The table at ``version`` (default: latest published). The file
    list is pinned at resolve time — concurrent commits cannot change
    what this DataFrame reads. Raises on a table with no published
    snapshot.

    ``where`` (r8) routes a SQL predicate through the zone maps
    automatically: the expression is parsed with Spark's own parser
    (:func:`sql_predicates`), the prunable subset skips files whose
    recorded min/max/null-count stats prove them irrelevant, and the
    FULL expression is re-applied row-level — result identical to
    ``read_snapshot(...).where(where)``, bytes read proportional to
    matching files on a sorted layout. Unparseable/unprunable
    expressions degrade to the plain filtered read (sound
    weakening).

    ``as_of`` (r8) time-travels: resolve the latest version committed
    at or before the cutoff (ISO-8601 string or epoch seconds) —
    "what did the table look like before yesterday's load" without
    knowing version numbers. Mutually exclusive with ``version``;
    see :func:`snapshot_history` for the audit log. Stamps are
    commit-time authoritative (r10): each publish records
    ``max(prev_stamp + 1 µs, now)``, so as-of resolution agrees
    with commit order even under multi-writer clock skew."""
    if sum(x is not None for x in (version, as_of, tag)) > 1:
        raise ValueError("pass at most one of version, as_of, tag")
    if tag is not None:
        _validate_ref_name(tag)
        try:
            version = json.loads(_read_text(
                spark, f"{path}/{_REFS_DIR}/{tag}.json"))["version"]
        except Exception as e:
            raise FileNotFoundError(
                f"no tag {tag!r} on {path}") from e
    if as_of is not None:
        version = _resolve_as_of(spark, path, as_of)
    if version is None:
        version = latest_version(spark, path)
        if version is None:
            raise FileNotFoundError(
                f"no published snapshot under {path}")
    m = _load_manifest(spark, path, version)
    entries = _manifest_entries(spark, path, m)
    if where is not None:
        dnf = sql_predicates(spark, where)
        if dnf is not None:
            entries = _prune_entries(entries, dnf, m.get("schema"))
    if not entries:
        schema = m.get("schema")
        if not schema:
            raise FileNotFoundError(
                f"snapshot {version} of {path} is empty and carries "
                f"no schema")
        from pyspark.sql.types import StructType
        out = spark.createDataFrame(
            [], StructType.fromJson(json.loads(schema)))
        return out.where(where) if where is not None else out
    out = _read_files(spark, path, entries, m.get("schema"))
    return out.where(where) if where is not None else out


#: predicate triples are ``(column, op, value)``: comparisons take a
#: scalar, ``in`` a list of scalars, ``is_null``/``is_not_null``
#: ignore the value (pass None)
_SCAN_OPS = ("=", "<", "<=", ">", ">=", "in", "is_null", "is_not_null")
_RANGE_OPS = ("=", "<", "<=", ">", ">=")
#: DNF width cap for OR expansion — beyond this the expression is
#: read unpruned rather than exploding the per-file check
_MAX_DISJUNCTS = 64


def _query_intervals(predicates: list[tuple]) -> dict[str, tuple]:
    """Fold a conjunction's RANGE predicates into one (lo, lo_incl,
    hi, hi_incl) interval per column — tighter than per-predicate
    checks: a between-style pair like ``x >= 15 AND x < 12`` proves
    itself empty even when each bound alone overlaps a file's
    range."""
    out: dict[str, tuple] = {}
    for col, op, val in predicates:
        if op not in _RANGE_OPS:
            continue
        lo, lo_i, hi, hi_i = out.get(col, (None, True, None, True))
        if op in ("=", ">=", ">"):
            inc = op != ">"
            if lo is None or val > lo or (val == lo and not inc):
                lo, lo_i = val, inc
        if op in ("=", "<=", "<"):
            inc = op != "<"
            if hi is None or val < hi or (val == hi and not inc):
                hi, hi_i = val, inc
        out[col] = (lo, lo_i, hi, hi_i)
    return out


_PCT_ESC = None


def _partition_values(entry: dict) -> dict:
    """The entry's hive partition values as ``{col: raw_string|None}``
    (percent-escapes undone, the NULL sentinel mapped to None) — what
    manifest-level partition pruning evaluates predicates against."""
    global _PCT_ESC
    if _PCT_ESC is None:
        import re as _re
        _PCT_ESC = _re.compile("%([0-9A-Fa-f]{2})")
    out: dict = {}
    part = entry.get("partition") or ""
    if not part:
        return out
    for seg in part.split("/"):
        c, eq, v = seg.partition("=")
        if not eq:
            continue
        out[c] = None if v == "__HIVE_DEFAULT_PARTITION__" else \
            _PCT_ESC.sub(lambda m: chr(int(m.group(1), 16)), v)
    return out


#: both spellings appear in the wild: StructType JSON uses
#: byte/short/integer/long, SQL simpleString uses
#: tinyint/smallint/int/bigint
_INT_TYPES = {"byte", "short", "integer", "long",
              "tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}
_NUM_TYPES = _INT_TYPES | _FLOAT_TYPES


def _partition_rejects(pvals: dict, col: str, op: str, val,
                       col_type: str | None) -> bool:
    """True only when the entry's PARTITION VALUE proves the
    predicate can't match. Comparison is TYPE-DIRECTED by the
    manifest schema — partition values are directory strings, and
    comparing them in the wrong domain is unsound in both directions
    (lexicographic "9" > "10" vs numeric, "01" = 1 vs string), so:
    numeric columns compare after numeric coercion of BOTH sides,
    string columns compare as strings against string literals (UTF-8
    byte order equals code-point order, so lexicographic range ops
    are sound), and every other combination — unknown column type,
    cross-domain literal, date/decimal columns, coercion failure —
    KEEPS the file. ``is_[not_]null`` needs no type (the NULL
    sentinel is type-free)."""
    if col not in pvals:
        return False
    pv = pvals[col]
    if op == "is_null":
        return pv is not None
    if op == "is_not_null":
        return pv is None
    if pv is None:
        return True                    # null partition: no comparison
    numeric = col_type in _NUM_TYPES
    string = col_type == "string"
    if not numeric and not string:
        return False

    def coerce(v):
        if isinstance(v, bool):
            raise TypeError("boolean partition coercion is ambiguous")
        if numeric and isinstance(v, (int, float)):
            # parse by the COLUMN's type: int() keeps bigint
            # comparisons exact past 2^53 (Python int/float
            # comparisons are exact, so a float literal against an
            # integral column needs no rounding either)
            return (int(pv) if col_type in _INT_TYPES
                    else float(pv)), v
        if string and isinstance(v, str):
            return pv, v
        raise TypeError("cross-domain comparison proves nothing")
    try:
        if op == "in":
            if not val:
                return True
            def neq(v):
                a, b = coerce(v)
                return a != b
            return all(neq(v) for v in val)
        a, b = coerce(val)
        return {"=": a != b, "<": not a < b,
                "<=": not a <= b, ">": not a > b,
                ">=": not a >= b}[op]
    except (TypeError, ValueError):
        return False


def _conj_may_match(entry: dict, predicates: list[tuple],
                    col_types: dict | None = None,
                    pvals: dict | None = None) -> bool:
    """File-granular zone-map check for ONE conjunction: False only
    when the entry's stats (or the conjunction's own emptiness) PROVE
    no row can satisfy it. Entries without stats for a predicate's
    column are always kept (new columns, tables that enabled stats
    mid-life); an all-null file (min is None) is pruned for any
    comparison/IN (no non-null value exists) and for ``is_not_null``;
    ``is_null`` prunes files whose recorded null count is zero.

    Type guard: a predicate whose value doesn't compare with the
    file's stat type (e.g. an auto-routed numeric literal against a
    string column) KEEPS the file — pruning may only ever remove
    files it can PROVE irrelevant, and a TypeError proves nothing.

    Partition pruning (r8c): predicates on HIVE PARTITION columns are
    evaluated against the entry's directory values at the MANIFEST
    level — no stats needed, and the pruned file is never listed or
    existence-checked at all (Catalyst's own partition pruning can
    only help after the reader has resolved the explicit file list,
    which at 10⁶ files is itself the cost)."""
    st = entry.get("stats") or {}
    if pvals is None:
        pvals = _partition_values(entry) if col_types else {}
    try:
        if pvals and col_types:
            for col, op, val in predicates:
                if _partition_rejects(pvals, col, op, val,
                                      col_types.get(col)):
                    return False
        for col, (lo, lo_i, hi, hi_i) in \
                _query_intervals(predicates).items():
            if lo is not None and hi is not None and (
                    lo > hi or (lo == hi and not (lo_i and hi_i))):
                return False           # self-contradictory conjunction
            s = st.get(col)
            if s is None or "min" not in s:
                continue               # no stats / bloom-only entry
            mn, mx = s["min"], s["max"]
            if mn is None:
                return False
            if lo is not None and (mx < lo or (mx == lo and not lo_i)):
                return False
            if hi is not None and (mn > hi or (mn == hi and not hi_i)):
                return False
        def _bloom_rejects(s: dict, v) -> bool:
            """True only when the file's bloom mask PROVES v absent:
            mask recorded, literal's type matches the column's
            recorded tag (prevents coercion mispruning), no bit
            missing."""
            hx, tag = s.get("bloom"), s.get("bloom_t")
            if hx is None:
                return False
            if isinstance(v, str):
                ok = tag == "s"
            elif isinstance(v, int) and not isinstance(v, bool):
                ok = tag == "i"
            else:
                ok = False
            return ok and not _bloom_contains(hx, v)

        for col, op, val in predicates:
            s = st.get(col)
            if s is None:
                continue
            if op == "=":
                if _bloom_rejects(s, val):
                    return False
            elif op == "in":
                if not val:
                    return False       # x IN () is vacuously false
                if "min" in s:
                    mn, mx = s["min"], s["max"]
                    if mn is None:
                        return False   # all-null file
                    if not any(mn <= v <= mx for v in val):
                        return False
                if all(_bloom_rejects(s, v) for v in val):
                    return False
            elif op == "is_null":
                if s.get("nulls") == 0:
                    return False
            elif op == "is_not_null":
                if "min" in s and s["min"] is None \
                        and s.get("rows", 0) > 0:
                    return False
                nulls, rows = s.get("nulls"), s.get("rows")
                if nulls is not None and rows is not None \
                        and nulls == rows:
                    return False
    except TypeError:
        return True
    return True


def _entry_may_match(entry: dict, dnf: list[list[tuple]],
                     col_types: dict | None = None) -> bool:
    """Keep an entry iff ANY disjunct's conjunction may match.
    Partition values are parsed ONCE per entry here (not per
    conjunction) — at 10\u2076 files the dir parse is the pruning
    hot path."""
    pvals = _partition_values(entry) if col_types else {}
    return any(_conj_may_match(entry, conj, col_types, pvals)
               for conj in dnf)


def _as_dnf(predicates) -> list[list[tuple]]:
    """Normalize the public predicate forms — a conjunction
    ``[(col, op, val), ...]`` (back-compat) or a DNF
    ``[[triple, ...], ...]`` (OR of conjunctions) — and validate
    ops."""
    if not predicates:
        return [[]]
    if isinstance(predicates[0][0], str):
        dnf = [list(predicates)]
    else:
        dnf = [list(c) for c in predicates]
    for conj in dnf:
        for col, op, _ in conj:
            if op not in _SCAN_OPS:
                raise ValueError(
                    f"unsupported predicate op {op!r} on {col!r}; "
                    f"supported: {_SCAN_OPS}")
    return dnf


def _schema_col_types(schema_json: str | None) -> dict:
    """``{column: simple type string}`` from a manifest schema — what
    partition-value pruning needs to pick a sound comparison
    domain."""
    if not schema_json:
        return {}
    try:
        return {f["name"]: (f["type"] if isinstance(f["type"], str)
                            else None)
                for f in json.loads(schema_json)["fields"]}
    except Exception:
        return {}


def _prune_entries(entries: list[dict], predicates,
                   schema_json: str | None = None) -> list[dict]:
    dnf = _as_dnf(predicates)
    types = _schema_col_types(schema_json)
    return [e for e in entries if _entry_may_match(e, dnf, types)]


def _predicates_condition(predicates) -> F.Column:
    """The row-level Column equivalent of a predicate set — re-applied
    after pruning so the result equals the unpruned filtered read
    exactly (stats are file-granular; rows inside surviving files
    still need the cut)."""
    def conj_cond(conj):
        cond = F.lit(True)
        for col, op, val in conj:
            c = F.col(col)
            if op == "in":
                cond = cond & (c.isin(list(val)) if val else F.lit(False))
            elif op == "is_null":
                cond = cond & c.isNull()
            elif op == "is_not_null":
                cond = cond & c.isNotNull()
            else:
                cond = cond & {"=": c == val, "<": c < val,
                               "<=": c <= val, ">": c > val,
                               ">=": c >= val}[op]
        return cond

    dnf = _as_dnf(predicates)
    out = F.lit(False)
    for conj in dnf:
        out = out | conj_cond(conj)
    return out


def sql_predicates(spark: SparkSession, where: str):
    """Parse a SQL boolean expression into the DNF triple form the
    zone maps understand, via Spark's OWN parser (Catalyst AST walk —
    the predicate semantics are exactly Spark's, no shadow grammar).

    SOUND WEAKENING by construction: any subexpression the zone maps
    can't evaluate (function calls, column-to-column comparisons,
    NOT over comparisons, exotic literals) is widened — dropped from
    its conjunction, or collapsing its whole disjunction to
    "unprunable" — so the pruned file set is always a superset of the
    matching files; the caller re-applies the FULL expression
    row-level. Returns None when nothing prunable survives (callers
    then skip pruning entirely). OR expansion is capped at
    ``_MAX_DISJUNCTS``."""
    node = spark._jsparkSession.sessionState().sqlParser() \
        .parseExpression(where)

    def lit_value(lit):
        dt = lit.dataType().simpleString()
        v = lit.value()
        if v is None:
            return None
        if dt in ("int", "bigint", "smallint", "tinyint"):
            return int(v)
        if dt in ("double", "float") or dt.startswith("decimal"):
            return float(str(v))
        if dt == "string":
            return str(v)
        if dt == "boolean":
            return bool(v)
        raise ValueError(f"unsupported literal type {dt}")

    def attr_name(a):
        return str(a.name())

    _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "="}

    def leaf(n):
        """One comparison → a triple, or None if not prunable."""
        kind = n.getClass().getSimpleName()
        ch = n.children()
        kids = [ch.apply(i) for i in range(ch.size())]
        names = [k.getClass().getSimpleName() for k in kids]
        cmp_ops = {"EqualTo": "=", "LessThan": "<",
                   "LessThanOrEqual": "<=", "GreaterThan": ">",
                   "GreaterThanOrEqual": ">=", "EqualNullSafe": "="}
        try:
            if kind in cmp_ops and len(kids) == 2:
                if names == ["UnresolvedAttribute", "Literal"]:
                    v = lit_value(kids[1])
                    if v is None:
                        return ((attr_name(kids[0]), "is_null", None)
                                if kind == "EqualNullSafe" else None)
                    return (attr_name(kids[0]), cmp_ops[kind], v)
                if names == ["Literal", "UnresolvedAttribute"]:
                    v = lit_value(kids[0])
                    if v is None:
                        return ((attr_name(kids[1]), "is_null", None)
                                if kind == "EqualNullSafe" else None)
                    return (attr_name(kids[1]), _FLIP[cmp_ops[kind]], v)
                return None
            if kind == "In" and names[:1] == ["UnresolvedAttribute"]:
                vals = []
                for k, nm in zip(kids[1:], names[1:]):
                    if nm != "Literal":
                        return None
                    v = lit_value(k)
                    if v is None:
                        continue       # IN (…, NULL) never matches NULL
                    vals.append(v)
                return (attr_name(kids[0]), "in", vals)
            if kind == "IsNull" and names == ["UnresolvedAttribute"]:
                return (attr_name(kids[0]), "is_null", None)
            if kind == "IsNotNull" and names == ["UnresolvedAttribute"]:
                return (attr_name(kids[0]), "is_not_null", None)
            if kind == "Not" and len(kids) == 1:
                inner = leaf(kids[0])
                if inner and inner[1] == "is_null":
                    return (inner[0], "is_not_null", None)
                if inner and inner[1] == "is_not_null":
                    return (inner[0], "is_null", None)
                return None
        except ValueError:
            return None
        return None

    def dnf(n):
        """DNF as list of conjunctions; None = unprunable subtree."""
        kind = n.getClass().getSimpleName()
        ch = n.children()
        if kind == "UnresolvedFunction":
            # BETWEEN parses as 'between(attr, lo, hi) in Spark 4 —
            # expand to the two range triples; any other function is
            # unprunable
            try:
                np = n.nameParts()
                fname = str(np.apply(np.size() - 1)).lower()
            except Exception:  # noqa: BLE001 — unexpected node shape
                return None
            if fname == "between" and ch.size() == 3:
                kids = [ch.apply(i) for i in range(3)]
                names = [k.getClass().getSimpleName() for k in kids]
                if names == ["UnresolvedAttribute", "Literal",
                             "Literal"]:
                    try:
                        lo, hi = lit_value(kids[1]), lit_value(kids[2])
                    except ValueError:
                        return None
                    if lo is None or hi is None:
                        return None
                    col = attr_name(kids[0])
                    return [[(col, ">=", lo), (col, "<=", hi)]]
            return None
        if kind == "And":
            a, b = dnf(ch.apply(0)), dnf(ch.apply(1))
            if a is None:
                return b
            if b is None:
                return a
            out = [ca + cb for ca in a for cb in b]
            return out if len(out) <= _MAX_DISJUNCTS else None
        if kind == "Or":
            a, b = dnf(ch.apply(0)), dnf(ch.apply(1))
            if a is None or b is None:
                return None            # one wide branch widens the OR
            out = a + b
            return out if len(out) <= _MAX_DISJUNCTS else None
        t = leaf(n)
        return [[t]] if t is not None else None

    out = dnf(node)
    if out is None or out == [[]] or all(not c for c in out):
        return None
    return out


def scan_pruning_stats(spark: SparkSession, path: str, predicates, *,
                       version: int | None = None) -> dict:
    """The observability half of "no silent caps" for the storage
    layer: how much the zone maps actually skipped for a predicate
    set — ``{"files_total", "files_read", "files_pruned"}`` — without
    reading any data (manifest-only)."""
    if version is None:
        version = latest_version(spark, path)
        if version is None:
            raise FileNotFoundError(f"no published snapshot under {path}")
    m = _load_manifest(spark, path, version)
    entries = _manifest_entries(spark, path, m)
    kept = _prune_entries(entries, predicates, m.get("schema"))
    return {"files_total": len(entries), "files_read": len(kept),
            "files_pruned": len(entries) - len(kept)}


def snapshot_scan(spark: SparkSession, path: str,
                  predicates, *,
                  version: int | None = None) -> DataFrame:
    """Read a snapshot with FILE-LEVEL data skipping: ``predicates``
    is a conjunction of ``(column, op, value)`` triples — ops ``= <
    <= > >=``, ``in`` (value = list), ``is_null``/``is_not_null``
    (value ignored) — or a DNF list of such conjunctions (OR of ANDs,
    r8), evaluated against the per-file min/max/null-count zone maps
    recorded at write time (``stats_cols=``), so files whose value
    range provably can't match are never handed to Spark at all — on
    a time- or key-sorted layout (:func:`snapshot_compact` with
    ``sort_cols``, `tables.write_time_sorted`) a selective scan reads
    O(matching files), not O(table), BEFORE any executor spins up.
    Hive-partition predicates prune at the MANIFEST level too (r8c):
    the entry's directory values are evaluated type-directed against
    the manifest schema, so skipped partitions' files are never even
    LISTED — Catalyst's own partition pruning only helps after the
    reader has resolved the explicit file list, which at 10\u2076 files
    is itself the cost. Zone maps cover the DATA columns
    partitioning can't. SQL-string predicates route automatically:
    ``read_snapshot(spark, path, where="...")`` parses the expression
    with Spark's own parser (:func:`sql_predicates`) and prunes with
    whatever subset of it the zone maps can evaluate.

    The same predicates are re-applied as a DataFrame filter (stats
    are file-granular, rows inside a surviving file still need the
    row-level cut, and parquet row-group pushdown gets its second
    bite), so the result equals ``read_snapshot(...).where(...)``
    exactly. Files without stats for a predicate column are kept —
    skipping is an optimization, never a semantics change.
    :func:`scan_pruning_stats` reports files read/pruned for the same
    predicates without reading data."""
    return _scan_with_stats(spark, path, predicates,
                            version=version)[0]


def _scan_with_stats(spark: SparkSession, path: str, predicates, *,
                     version: int | None = None
                     ) -> tuple[DataFrame, dict]:
    """:func:`snapshot_scan` plus its pruning stats from ONE manifest
    walk — maintenance loops that both read and report (e.g. the join
    view's other-side pruning) should not pay the metadata pass
    twice."""
    if version is None:
        version = latest_version(spark, path)
        if version is None:
            raise FileNotFoundError(f"no published snapshot under {path}")
    m = _load_manifest(spark, path, version)
    all_entries = _manifest_entries(spark, path, m)
    entries = _prune_entries(all_entries, predicates, m.get("schema"))
    stats = {"files_total": len(all_entries),
             "files_read": len(entries),
             "files_pruned": len(all_entries) - len(entries)}
    cond = _predicates_condition(predicates)
    if not entries:
        schema = m.get("schema")
        if not schema:
            raise FileNotFoundError(
                f"snapshot {version} of {path} is empty and carries "
                f"no schema")
        from pyspark.sql.types import StructType
        return spark.createDataFrame(
            [], StructType.fromJson(json.loads(schema))).where(cond), \
            stats
    return (_read_files(spark, path, entries, m.get("schema"))
            .where(cond), stats)


def snapshot_write(spark: SparkSession, path: str, df: DataFrame, *,
                   partition_cols: list[str],
                   stats_cols: list[str] | None = None,
                   bloom_cols: list[str] | None = None,
                   bloom_bits: int | None = None,
                   _append_sources: dict | None = None) -> int:
    """Publish ``df`` as the table's next full snapshot (initial load
    or wholesale replace). ``stats_cols`` opts the table into per-file
    min/max zone maps (see :func:`snapshot_scan`); ``bloom_cols``
    (r8) into per-file bloom masks that prune ``=`` / ``IN`` point
    lookups on high-cardinality unsorted columns where min/max can't
    (string/integral columns only). Once set, either is carried by
    every later commit, so the whole file list stays prunable.
    ``_append_sources`` is :func:`snapshot_append`'s replay-marker
    pass-through for the new-table case. Returns the committed
    version."""
    prev = latest_version(spark, path)
    srcs = dict(_append_sources or {})
    if prev is not None:
        m_prev = _load_manifest(spark, path, prev)
        if stats_cols is None:
            stats_cols = m_prev.get("stats_cols")
        if bloom_cols is None:
            bloom_cols = m_prev.get("bloom_cols")
        if bloom_bits is None:
            bloom_bits = m_prev.get("bloom_bits")
        # replay markers survive a wholesale replace: a replayed old
        # stream batch must stay a no-op afterward too
        srcs = {**(m_prev.get("append_sources") or {}), **srcs}
    entries = _write_data_files(spark, path, df, partition_cols,
                                stats_cols, bloom_cols, bloom_bits)
    version = 0 if prev is None else prev + 1
    _commit_manifest(spark, path, version, {
        "version": version, "partition_cols": partition_cols,
        "schema": df.schema.json(), "stats_cols": stats_cols,
        "bloom_cols": bloom_cols, "bloom_bits": bloom_bits,
        "append_sources": srcs or None, "operation": "write",
        **_build_file_refs(spark, path, {}, set(), entries)})
    return version


def snapshot_append(spark: SparkSession, path: str, df: DataFrame, *,
                    partition_cols: list[str] | None = None,
                    schema_evolution: bool = False,
                    stats_cols: list[str] | None = None,
                    bloom_cols: list[str] | None = None,
                    bloom_bits: int | None = None,
                    source_batch: tuple[str, int] | None = None,
                    retries: int = 5) -> int:
    """Append ``df``'s rows as the table's next snapshot — the
    cheapest commit the format has and the one an ingest loop issues
    most: NO existing data is read or rewritten, the new manifest
    carries every previous file/segment BY REFERENCE and lists only
    the files this batch produced, so commit cost is O(batch), however
    large the table. (Contrast :func:`snapshot_upsert`, which must
    read and rewrite the affected partitions to merge keys — append
    has no keys and therefore no read side.)

    Schema contract matches the upsert family: partition columns are
    always required; any other column drift raises unless
    ``schema_evolution=True``, in which case the manifest's schema
    becomes the union (old files read NULL for new columns, new files
    read NULL for dropped ones — no mergeSchema footer sweep, the
    manifest IS the schema authority). ``partition_cols`` defaults to
    the table's; on a brand-new table it (and optionally
    ``stats_cols``) must be supplied and the call degenerates to
    :func:`snapshot_write`. ``stats_cols`` distinguishes None (keep
    the table's recorded stats columns) from ``[]`` (explicitly
    disable zone-map stats from this commit on); under
    ``schema_evolution=True`` a recorded stats column legitimately
    absent from this batch is skipped, not raised on — its files
    simply carry no stats and stay un-prunable on that column.
    Returns the committed version.

    ``source_batch=(source, batch_id)`` makes the append EXACTLY-ONCE
    under replay: the manifest records the highest batch_id applied
    per source, atomically with the data it admitted, and a replayed
    batch (id ≤ the recorded one) is a version-preserving no-op — the
    foreachBatch recipe with the marker riding the commit itself, so
    no crash window exists between "rows visible" and "batch marked
    applied". Use distinct ``source`` names when several streams feed
    one table (batch ids are only monotone per checkpoint).

    ``retries`` (r8) bounds the built-in retry-with-rebase under
    multi-writer contention: an append that loses the version race
    restacks its ALREADY-WRITTEN files on the new head (carry-by-
    reference refs rebuilt, replay/partition/schema/stats contracts
    re-checked against the new manifest) and retries only the
    manifest commit — no data rewrite, linear history, both
    appenders land. Exhausted retries re-raise ConcurrentCommit.
    Appends are the ONLY rebase-safe commit (they read nothing);
    upserts/deletes keep raise-only semantics because their merge
    read is stale after a race — re-run the whole operation."""
    prev = latest_version(spark, path)
    if prev is None:
        if partition_cols is None:
            raise ValueError(
                "appending to a new table: pass partition_cols to "
                "establish the layout")
        srcs0 = {source_batch[0]: source_batch[1]} if source_batch \
            else None
        return snapshot_write(spark, path, df,
                              partition_cols=partition_cols,
                              stats_cols=stats_cols,
                              bloom_cols=bloom_cols,
                              bloom_bits=bloom_bits,
                              _append_sources=srcs0)
    from pyspark.sql.types import StructType

    from .tables import _check_schema_drift

    def _prep(head: int):
        """Per-head derivations — re-run on every rebase so the commit
        always reflects the manifest it stacks on: replay markers
        (another writer may have admitted our batch), partition
        contract, schema merge, stats contract. Returns None when the
        head already admitted this source_batch (no-op)."""
        m = _load_manifest(spark, path, head)
        srcs = dict(m.get("append_sources") or {})
        if source_batch is not None:
            src, bid = source_batch
            if bid <= srcs.get(src, -1):
                return None              # replayed batch: no-op
            srcs[src] = bid
        if partition_cols is not None \
                and m["partition_cols"] != partition_cols:
            raise ValueError(
                f"partition_cols {partition_cols} do not match the "
                f"table's {m['partition_cols']}")
        part_cols = m["partition_cols"]
        schema_json = m.get("schema")
        if schema_json:
            table_schema = StructType.fromJson(json.loads(schema_json))
            _check_schema_drift([f.name for f in table_schema.fields],
                                df.columns, [], part_cols,
                                schema_evolution)
            merged_schema = (
                spark.createDataFrame([], table_schema)
                .unionByName(df.limit(0),
                             allowMissingColumns=schema_evolution)
                .schema)
        else:
            merged_schema = df.schema
        # None = inherit the table's stats columns; [] = explicit
        # disable (`or` would conflate the two, making stats
        # impossible to turn off once enabled)
        eff_stats = stats_cols if stats_cols is not None \
            else (m.get("stats_cols") or [])
        eff_bloom = bloom_cols if bloom_cols is not None \
            else (m.get("bloom_cols") or [])
        eff_bits = bloom_bits if bloom_bits is not None \
            else m.get("bloom_bits")
        return (m, srcs, part_cols, merged_schema, eff_stats,
                eff_bloom, eff_bits)

    prep = _prep(prev)
    if prep is None:
        return prev
    m, srcs, part_cols, merged_schema, eff_stats, eff_bloom, \
        eff_bits = prep
    if schema_evolution:
        # a recorded stats column absent from this batch is a legal
        # schema-evolution drop: record no stats for it rather than
        # failing the append (entries without stats are never pruned)
        write_stats = [c for c in eff_stats if c in df.columns]
        write_bloom = [c for c in eff_bloom if c in df.columns]
    else:
        write_stats, write_bloom = eff_stats, eff_bloom
    new_entries = _write_data_files(spark, path, df, part_cols,
                                    write_stats, write_bloom, eff_bits)
    # Bounded retry-with-REBASE (r8): an append touches no existing
    # data, so losing the version race never invalidates the work —
    # the already-written files restack on the new head (fresh
    # carry-by-reference refs, re-run contract checks) and only the
    # manifest commit retries. Upserts/deletes can NOT do this (their
    # merge read is stale after a race) — they surface
    # ConcurrentCommit for the caller to re-run whole.
    head = prev
    for attempt in range(retries + 1):
        try:
            _commit_manifest(spark, path, head + 1, {
                "version": head + 1, "partition_cols": part_cols,
                "schema": merged_schema.json(),
                "stats_cols": eff_stats or None,
                "bloom_cols": eff_bloom or None,
                "bloom_bits": eff_bits,
                "append_sources": srcs or None, "operation": "append",
                **_build_file_refs(spark, path, m, set(), new_entries)})
            return head + 1
        except ConcurrentCommit:
            if attempt >= retries:
                raise
            new_head = latest_version(spark, path)
            if new_head is None:
                raise
            if new_head <= head:
                # transient contention (e.g. LockFileCommit's lock
                # held by a writer that hasn't published yet): same
                # commit retries after a short backoff — no rebase
                # needed until a version actually lands
                import time
                time.sleep(min(0.2 * (attempt + 1), 2.0))
                continue
            head = new_head
            prep = _prep(head)
            if prep is None:
                return head              # competitor admitted our batch
            (m, srcs, part_cols, merged_schema, eff_stats,
             eff_bloom, eff_bits) = prep
    raise AssertionError("unreachable")


def _affected_dirs(updates_vals: list[tuple],
                   partition_cols: list[str]) -> set[str]:
    return {_hive_partition_dir(partition_cols, v) for v in updates_vals}


def snapshot_upsert(spark: SparkSession, path: str, updates: DataFrame,
                    keys: list[str], *, partition_cols: list[str],
                    order_col: str | None = None,
                    immutable_partitions: bool = True,
                    schema_evolution: bool = False) -> int:
    """Keyed SCD1 merge as a copy-on-write snapshot commit — the
    crash-safe, concurrent-reader-safe form of
    :func:`~.tables.merge_upsert`, with the identical merge semantics
    (one row per key survives; highest ``order_col`` wins when given,
    else updates beat existing; ``immutable_partitions=False`` also
    rewrites the partitions the updated keys currently live in so a
    moved key's stale copy is merged away) and the identical
    ``schema_evolution`` contract (drifted update columns raise by
    default; with ``True``, new columns evolve the table — and because
    the MANIFEST carries the evolved schema, readers see the new
    column as NULL in carried-forward partitions with no mergeSchema
    needed, the caveat the in-place path has).

    Commit shape: only the affected partitions' rows are read and
    rewritten; untouched partitions are carried forward BY REFERENCE
    in the new manifest (zero data movement). A crash at any point
    leaves the previous snapshot fully readable — at worst some
    unreferenced data files for :func:`snapshot_prune` to collect.
    Returns the committed version."""
    prev = latest_version(spark, path)
    if prev is None:
        return snapshot_write(spark, path, updates,
                              partition_cols=partition_cols)
    m = _load_manifest(spark, path, prev)
    if m["partition_cols"] != partition_cols:
        raise ValueError(
            f"partition_cols {partition_cols} do not match the "
            f"table's {m['partition_cols']}")

    from pyspark.sql.types import StructType

    from .tables import _check_schema_drift
    table_cols = ([f.name for f in StructType.fromJson(
        json.loads(m["schema"])).fields] if m.get("schema") else [])
    if table_cols:
        _check_schema_drift(table_cols, updates.columns, keys,
                            partition_cols, schema_evolution)

    entries = _manifest_entries(spark, path, m)
    aff_vals = [tuple(r) for r in
                updates.select(*partition_cols).distinct().collect()]
    aff = _affected_dirs(aff_vals, partition_cols)
    if not immutable_partitions:
        current = _read_files(spark, path, entries, m.get("schema")) \
            if entries else None
        if current is not None:
            moved = [tuple(r) for r in
                     (current.join(updates.select(*keys).distinct(),
                                   keys, "left_semi")
                      .select(*partition_cols).distinct().collect())]
            aff |= _affected_dirs(moved, partition_cols)

    hit = [e for e in entries if e["partition"] in aff]

    if hit:
        existing = _read_files(spark, path, hit, m.get("schema"))
        tagged = (existing.withColumn("_src", F.lit(0))
                  .unionByName(updates.withColumn("_src", F.lit(1)),
                               allowMissingColumns=schema_evolution))
    else:
        tagged = updates.withColumn("_src", F.lit(1))
        if schema_evolution and m.get("schema"):
            # no affected files, but the table schema must still union
            # with the updates' so carried partitions keep their columns
            empty = spark.createDataFrame([], StructType.fromJson(
                json.loads(m["schema"])))
            tagged = (empty.withColumn("_src", F.lit(0))
                      .unionByName(tagged, allowMissingColumns=True))
    order = ([F.col(order_col).desc_nulls_last()] if order_col else []) \
        + [F.col("_src").desc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (tagged.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1).drop("_rn", "_src"))

    new_entries = _write_data_files(spark, path, merged, partition_cols,
                                    m.get("stats_cols"),
                                    m.get("bloom_cols"),
                                    m.get("bloom_bits"))
    _commit_manifest(spark, path, prev + 1, {
        "version": prev + 1, "partition_cols": partition_cols,
        "schema": merged.schema.json(),
        "stats_cols": m.get("stats_cols"),
        "bloom_cols": m.get("bloom_cols"),
        "bloom_bits": m.get("bloom_bits"),
        "append_sources": m.get("append_sources"),
        "operation": "upsert",
        **_build_file_refs(spark, path, m, aff, new_entries)})
    return prev + 1


def snapshot_delete(spark: SparkSession, path: str, keys_df: DataFrame,
                    keys: list[str], *,
                    partition_cols: list[str]) -> int:
    """Keyed deletion as a copy-on-write snapshot commit — the
    crash-safe form of :func:`~.tables.delete_keys`. Affected
    partitions (the ones containing matches) are rewritten without the
    matching rows; a partition whose rows are all deleted simply has
    no files in the new manifest — no directory-drop step to crash
    between. Returns the committed version."""
    prev = latest_version(spark, path)
    if prev is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    m = _load_manifest(spark, path, prev)
    if m["partition_cols"] != partition_cols:
        raise ValueError(
            f"partition_cols {partition_cols} do not match the "
            f"table's {m['partition_cols']}")
    entries = _manifest_entries(spark, path, m)
    if not entries:
        return prev                      # empty table: nothing to do

    kd = keys_df.select(*keys).distinct()
    # both reads carry the manifest schema (like upsert/compact): after
    # a schema evolution, affected partitions mix physical schemas and
    # a footer-inferred read would silently drop the evolved column
    # from the rewrite
    current = _read_files(spark, path, entries, m.get("schema"))
    aff_vals = [tuple(r) for r in
                (current.join(kd, keys, "left_semi")
                 .select(*partition_cols).distinct().collect())]
    if not aff_vals:
        return prev                      # no matches: nothing to do
    aff = _affected_dirs(aff_vals, partition_cols)

    hit = [e for e in entries if e["partition"] in aff]
    remaining = (_read_files(spark, path, hit, m.get("schema"))
                 .join(kd, keys, "left_anti"))
    new_entries = _write_data_files(spark, path, remaining,
                                    partition_cols, m.get("stats_cols"),
                                    m.get("bloom_cols"),
                                    m.get("bloom_bits"))
    _commit_manifest(spark, path, prev + 1, {
        "version": prev + 1, "partition_cols": partition_cols,
        "schema": m.get("schema"), "stats_cols": m.get("stats_cols"),
        "bloom_cols": m.get("bloom_cols"),
        "bloom_bits": m.get("bloom_bits"),
        "append_sources": m.get("append_sources"),
        "operation": "delete",
        **_build_file_refs(spark, path, m, aff, new_entries)})
    return prev + 1


def snapshot_apply_changes(spark: SparkSession, path: str,
                           changes: DataFrame, keys: list[str], *,
                           partition_cols: list[str],
                           change_col: str = "_op",
                           source_batch: tuple[str, int] | None = None,
                           schema_evolution: bool = False) -> int:
    """Apply a keyed CDC changeset — upserts AND deletes — as ONE
    copy-on-write commit (MERGE-INTO semantics, the atomic sink for
    a :func:`snapshot_changes` feed or any per-key delta).
    ``changes`` carries the table's data columns plus ``change_col``
    ∈ {``upsert``, ``delete``}; delete rows need their key AND
    partition columns populated (the immutable-partitions contract:
    a key lives where its partition values say — the same assumption
    :func:`snapshot_upsert`'s default makes), other columns are
    ignored. A key listed as both loses its old row once and keeps
    the upsert row. Changesets should be keyed (one row per key per
    op); duplicate upsert keys land as duplicate rows.

    Why one commit instead of ``snapshot_upsert`` + ``snapshot_delete``:
    readers never observe the half-applied state, the affected
    partitions are read and rewritten ONCE instead of twice, and —
    decisive for exactly-once maintenance loops — the
    ``source_batch=(source, batch_id)`` replay marker covers the
    WHOLE changeset atomically (same contract as
    :func:`snapshot_append`: a replayed batch is a version-preserving
    no-op), so a crash-and-retry consumer like
    :func:`~..streaming.ingest.aggregate_sync_snapshot` can never
    double-apply a delta. An EMPTY changeset returns the current
    version without committing (and without recording the marker —
    replaying an empty batch is naturally a no-op).

    Commit shape matches the upsert family: only partitions named by
    the changeset's partition values are read/rewritten; everything
    else carries by reference. Schema drift raises unless
    ``schema_evolution=True``, which follows the upsert contract —
    the manifest schema becomes the union, carried partitions read
    the new column as NULL with no mergeSchema sweep (the CDC
    consumers pass this through so a source evolution flows into
    replicas instead of stalling them).
    Concurrency is raise-only (``ConcurrentCommit``) like
    upsert/delete — the merge read is stale after a lost race.
    Returns the committed version."""
    from pyspark.sql.types import StructType

    from .tables import _check_schema_drift
    if change_col not in changes.columns:
        raise ValueError(f"changes is missing the change column "
                         f"{change_col!r}")
    data_cols = [c for c in changes.columns if c != change_col]
    changes = changes.persist()
    try:
        # ONE driver action for op validation AND affected-partition
        # discovery: the changeset plan behind an IVM step can be a
        # whole change-feed diff + merge join — materializing it once
        # (into the persist) and answering both questions from the
        # same bounded summary halves the fixed per-job overhead that
        # dominates small maintenance commits
        summary = (changes.groupBy(change_col, *partition_cols)
                   .count().collect())
        ops: dict[str, int] = {}
        for r in summary:
            ops[r[0]] = ops.get(r[0], 0) + r[-1]
        # set, not sorted: partition values may include None, which
        # does not compare with strings
        aff_vals = list({tuple(r[1:1 + len(partition_cols)])
                         for r in summary})
        bad = set(ops) - {"upsert", "delete"}
        if bad:
            raise ValueError(
                f"unknown {change_col!r} values {sorted(bad)}; "
                f"expected 'upsert' or 'delete'")
        upserts = (changes.where(F.col(change_col) == "upsert")
                   .drop(change_col))
        prev = latest_version(spark, path)
        if prev is None:
            # empty or delete-only changesets still CREATE the table
            # (schema from the changeset, zero rows) — an initial
            # sync from an empty source must produce an empty
            # replica/view, not an error
            srcs0 = {source_batch[0]: source_batch[1]} \
                if source_batch else None
            return snapshot_write(spark, path, upserts,
                                  partition_cols=partition_cols,
                                  _append_sources=srcs0)
        if not ops:
            return prev                  # empty changeset: no-op
        m = _load_manifest(spark, path, prev)
        srcs = dict(m.get("append_sources") or {})
        if source_batch is not None:
            src, bid = source_batch
            if bid <= srcs.get(src, -1):
                return prev              # replayed batch: no-op
            srcs[src] = bid
        if m["partition_cols"] != partition_cols:
            raise ValueError(
                f"partition_cols {partition_cols} do not match the "
                f"table's {m['partition_cols']}")
        table_cols = ([f.name for f in StructType.fromJson(
            json.loads(m["schema"])).fields] if m.get("schema") else [])
        if table_cols:
            _check_schema_drift(table_cols, data_cols, keys,
                                partition_cols, schema_evolution)

        entries = _manifest_entries(spark, path, m)
        aff = _affected_dirs(aff_vals, partition_cols)
        hit = [e for e in entries if e["partition"] in aff]
        changed_keys = changes.select(*keys).distinct()
        if hit:
            existing = _read_files(spark, path, hit, m.get("schema"))
            # NULL-SAFE key match: a stored row whose key contains
            # NULL (an aggregate view's null group, say) must still
            # be replaced/deleted by its changeset row — a plain
            # equi-anti-join would never match it
            cond = None
            for k in keys:
                e = existing[k].eqNullSafe(changed_keys[k])
                cond = e if cond is None else cond & e
            merged = (existing.join(changed_keys, cond, "left_anti")
                      .unionByName(upserts,
                                   allowMissingColumns=schema_evolution))
        elif table_cols:
            # no affected files, but carried partitions must keep
            # their columns: union with the table schema's empty
            # frame (also pins column order without evolution)
            empty = spark.createDataFrame([], StructType.fromJson(
                json.loads(m["schema"])))
            merged = empty.unionByName(
                upserts, allowMissingColumns=schema_evolution)
        else:
            merged = upserts
        new_entries = _write_data_files(spark, path, merged,
                                        partition_cols,
                                        m.get("stats_cols"),
                                        m.get("bloom_cols"),
                                        m.get("bloom_bits"))
        _commit_manifest(spark, path, prev + 1, {
            "version": prev + 1, "partition_cols": partition_cols,
            "schema": (merged.schema.json() if m.get("schema")
                       or schema_evolution else None),
            "stats_cols": m.get("stats_cols"),
            "bloom_cols": m.get("bloom_cols"),
            "bloom_bits": m.get("bloom_bits"),
            "append_sources": srcs or None,
            "operation": "apply_changes",
            **_build_file_refs(spark, path, m, aff, new_entries)})
        return prev + 1
    finally:
        changes.unpersist()


def snapshot_rollback(spark: SparkSession, path: str,
                      to_version: int) -> int:
    """Publish a NEW version whose content is an old version's file
    list — the undo button every snapshot store owes its operators
    (bad upsert, poisoned CDC batch). Rolling FORWARD a copy (rather
    than deleting newer manifests) keeps history linear: the mistake
    and its undo are both auditable, and concurrent readers of the bad
    version stay consistent. The files must still exist — roll back
    within the :func:`snapshot_prune` retention window. Returns the
    new version."""
    prev = latest_version(spark, path)
    if prev is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    m = _load_manifest(spark, path, to_version)
    _commit_manifest(spark, path, prev + 1, {
        "version": prev + 1, "partition_cols": m["partition_cols"],
        "schema": m.get("schema"), "stats_cols": m.get("stats_cols"),
        "bloom_cols": m.get("bloom_cols"),
        "bloom_bits": m.get("bloom_bits"),
        "append_sources": m.get("append_sources"),
        "files": m.get("files") or [],
        "segments": m.get("segments") or [],
        "operation": "rollback",
        "rolled_back_from": to_version})
    return prev + 1


def snapshot_compact(spark: SparkSession, path: str, *,
                     target_file_bytes: int = 128 << 20,
                     partitions: list[str] | None = None,
                     sort_cols: list[str] | None = None,
                     zorder_cols: list[str] | None = None) -> int:
    """Compact a snapshot table's small files in place of the NEXT
    version — the snapshot-layer twin of
    :func:`~.tables.compact_files`, minus its swap-directories step
    (the manifest commit IS the swap). Appends/upserts accumulate
    per-commit file fragments; this rewrites each affected hive
    partition's rows into ~``ceil(bytes/target)`` files and publishes
    a manifest where those partitions' entries are replaced and all
    others carry forward by reference. ``partitions`` limits the pass
    to specific partition dirs (e.g. ``["day=d1"]``) so compaction can
    run incrementally over a huge table. ``sort_cols`` re-establishes
    a sorted layout in the same pass (range-partition + sort-within,
    exactly :func:`~.tables.compact_files`'s recipe — compaction is
    the natural moment to restore the zone-map clustering that
    upserts have degraded). ``zorder_cols`` (r9) clusters on the
    MORTON interleave of several columns instead
    (:func:`~.tables.zorder_key` — quantization ranges computed from
    the rows being compacted in one bounded agg), so the rewritten
    files' min/max stats are narrow on EVERY listed axis at once —
    multi-dimensional data skipping for ``snapshot_scan`` the way
    ``write_zordered`` gives it to plain directories. Mutually
    exclusive with ``sort_cols``. Readers of prior versions are
    untouched (old files live until pruned). Returns the new
    version."""
    if sort_cols and zorder_cols:
        raise ValueError("pass sort_cols or zorder_cols, not both")
    prev = latest_version(spark, path)
    if prev is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    m = _load_manifest(spark, path, prev)
    part_cols = m["partition_cols"]
    entries = _manifest_entries(spark, path, m)
    all_dirs = {e["partition"] for e in entries}
    target_dirs = set(partitions) if partitions is not None else all_dirs
    unknown = target_dirs - all_dirs
    if unknown:
        raise ValueError(f"unknown partitions {sorted(unknown)}; "
                         f"table has {sorted(all_dirs)}")
    hit = [e for e in entries if e["partition"] in target_dirs]
    if not hit:
        return prev
    jvm, fs, _ = _fs(spark, path)
    total = sum(fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(
        f"{path}/{_DATA_DIR}/{e['path']}")).getLen() for e in hit)
    n = max(1, -(-total // target_file_bytes))
    rows = _read_files(spark, path, hit, m.get("schema"))
    if zorder_cols:
        from .tables import zorder_key
        missing = [c for c in zorder_cols if c not in rows.columns]
        if missing:
            raise ValueError(f"zorder_cols {missing} not in the "
                             f"table's columns")
        # quantization bounds from the rows under compaction — one
        # bounded agg (2 scalars per column)
        aggs = []
        for c in zorder_cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
        b = rows.agg(*aggs).collect()[0]
        ranges = {}
        for c in zorder_cols:
            lo, hi = b[f"_mn_{c}"], b[f"_mx_{c}"]
            if lo is None or hi is None:       # all-null column
                lo, hi = 0.0, 1.0
            elif not hi > lo:                  # constant column
                hi = lo + 1.0
            ranges[c] = (lo, hi)
        zk = zorder_key(zorder_cols, ranges=ranges)
        keys = [*part_cols, zk]
        compacted = (rows.repartitionByRange(n, *keys)
                     .sortWithinPartitions(*keys))
    elif sort_cols:
        # partition cols lead the range key so each task writes whole
        # hive partitions (see tables.write_zordered)
        keys = [*part_cols, *sort_cols]
        compacted = (rows.repartitionByRange(n, *keys)
                     .sortWithinPartitions(*keys))
    elif part_cols:
        compacted = rows.repartition(n, *part_cols)
    else:
        compacted = rows.repartition(n)
    new_entries = _write_data_files(spark, path, compacted, part_cols,
                                    m.get("stats_cols"),
                                    m.get("bloom_cols"),
                                    m.get("bloom_bits"))
    _commit_manifest(spark, path, prev + 1, {
        "version": prev + 1, "partition_cols": part_cols,
        "schema": m.get("schema"), "stats_cols": m.get("stats_cols"),
        "bloom_cols": m.get("bloom_cols"),
        "bloom_bits": m.get("bloom_bits"),
        "append_sources": m.get("append_sources"),
        "operation": "compact",
        **_build_file_refs(spark, path, m, target_dirs, new_entries)})
    return prev + 1


def snapshot_prune(spark: SparkSession, path: str, *,
                   keep_latest: int = 2,
                   orphan_grace_seconds: float = 3600.0) -> dict:
    """Retention + garbage collection: drop all but the newest
    ``keep_latest`` manifests, then delete every data file no retained
    manifest references (including leftovers from crashed commits and
    any ``_tmp`` scratch). Keeping ≥2 versions preserves a rollback
    point AND a grace window for readers that resolved the previous
    version just before a commit. Returns counts of dropped manifests
    and deleted files.

    ``orphan_grace_seconds``: unreferenced files YOUNGER than this are
    left alone — a concurrent writer mid-commit has written its data
    files but not yet published its manifest, and a prune racing it
    would otherwise delete them and break the commit (the same
    orphan-retention rule every manifest-based table format applies).
    Set it comfortably above the longest commit's data-write time;
    0 only when no writer can be running."""
    if keep_latest < 1:
        raise ValueError(f"keep_latest must be >= 1, got {keep_latest}")
    import time
    cutoff_ms = (time.time() - orphan_grace_seconds) * 1000.0
    jvm, fs, _ = _fs(spark, path)
    mdir = f"{path}/{_MANIFEST_DIR}"
    jmdir = jvm.org.apache.hadoop.fs.Path(mdir)
    if not fs.exists(jmdir):
        return {"manifests_dropped": 0, "files_deleted": 0}
    versions = []
    for st in fs.listStatus(jmdir):
        name = st.getPath().getName()
        if name.endswith(".json") and not name.startswith("."):
            try:
                versions.append(int(name[:-len(".json")]))
            except ValueError:
                continue
    # tagged versions are pinned: their manifests (and, through the
    # referenced set below, their data files) survive retention for
    # as long as the tag exists (r8)
    tagged = set(snapshot_tags(spark, path).values()) & set(versions)
    keep = sorted(set(sorted(versions)[-keep_latest:]) | tagged)
    drop = [v for v in versions if v not in keep]

    referenced, live_segments = set(), set()
    for v in keep:
        m = _load_manifest(spark, path, v)
        live_segments |= {s["path"] for s in m.get("segments") or []}
        for e in _manifest_entries(spark, path, m):
            referenced.add(e["path"])

    deleted = 0
    data_root = jvm.org.apache.hadoop.fs.Path(f"{path}/{_DATA_DIR}")
    if fs.exists(data_root):
        root_uri = fs.makeQualified(data_root).toString()
        it = fs.listFiles(data_root, True)
        to_delete = []
        while it.hasNext():
            st = it.next()
            p = st.getPath()
            rel = p.toString()[len(root_uri):].lstrip("/")
            if rel not in referenced \
                    and st.getModificationTime() < cutoff_ms:
                to_delete.append(p)
        for p in to_delete:
            fs.delete(p, False)
            deleted += 1
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{mdir}/{v}.json"),
                  False)
    # segment files no retained manifest references (same grace rule:
    # a concurrent commit writes its segment just before publishing)
    for st in fs.listStatus(jmdir):
        name = st.getPath().getName()
        if (name.startswith("seg-") and name.endswith(".segment")
                and name not in live_segments
                and st.getModificationTime() < cutoff_ms):
            fs.delete(st.getPath(), False)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/_tmp")
    if fs.exists(tmp):
        for st in fs.listStatus(tmp):
            if st.getModificationTime() < cutoff_ms:
                fs.delete(st.getPath(), True)
    return {"manifests_dropped": len(drop), "files_deleted": deleted}


# -- change data feed (r8) --------------------------------------------------

#: the change-feed metadata columns; reserved in change output
_CHANGE_TYPE = "_change_type"
_COMMIT_VERSION = "_commit_version"


def snapshot_maintain(spark: SparkSession, path: str, *,
                      max_files_per_partition: int = 8,
                      target_file_bytes: int = 128 << 20,
                      sort_cols: list[str] | None = None,
                      zorder_cols: list[str] | None = None,
                      keep_latest: int | None = None,
                      orphan_grace_seconds: float = 3600.0) -> dict:
    """Policy-driven table maintenance in one call — what an ingest
    loop schedules after its commits instead of hand-rolling
    compact/prune decisions. Reads the HEAD MANIFEST ONLY (no data
    scan): partitions whose file count exceeds
    ``max_files_per_partition`` (append/upsert fragments piling up)
    are compacted in one :func:`snapshot_compact` commit — scoped to
    exactly those partitions, optionally re-clustered via
    ``sort_cols`` (range sort) or ``zorder_cols`` (Morton interleave,
    r9) to restore zone-map pruning; then, if ``keep_latest`` is set,
    :func:`snapshot_prune` applies retention (tagged versions stay
    protected, orphan grace as documented there). A table already
    within policy publishes NOTHING (no empty compact commit).
    Returns ``{"compacted_partitions": [...], "compact_version":
    int|None, "files_before": n, "files_after": n, "pruned":
    {...}|None}``."""
    if max_files_per_partition < 1:
        raise ValueError("max_files_per_partition must be >= 1, got "
                         f"{max_files_per_partition}")
    head = latest_version(spark, path)
    if head is None:
        raise FileNotFoundError(f"no published snapshot under {path}")
    entries = _manifest_entries(spark, path,
                                _load_manifest(spark, path, head))
    counts: dict[str, int] = {}
    for e in entries:
        counts[e["partition"]] = counts.get(e["partition"], 0) + 1
    fat = sorted(p for p, n in counts.items()
                 if n > max_files_per_partition)
    out = {"compacted_partitions": fat, "compact_version": None,
           "files_before": len(entries), "files_after": len(entries),
           "pruned": None}
    if fat:
        out["compact_version"] = snapshot_compact(
            spark, path, target_file_bytes=target_file_bytes,
            partitions=fat, sort_cols=sort_cols,
            zorder_cols=zorder_cols)
        out["files_after"] = len(_manifest_entries(
            spark, path,
            _load_manifest(spark, path, out["compact_version"])))
    if keep_latest is not None:
        out["pruned"] = snapshot_prune(
            spark, path, keep_latest=keep_latest,
            orphan_grace_seconds=orphan_grace_seconds)
    return out


def snapshot_changes(spark: SparkSession, path: str,
                     from_version: int, to_version: int | None = None,
                     *, key_cols: list[str] | None = None,
                     columns: list[str] | None = None) -> DataFrame:
    """Row-level change feed between two snapshots — what a consumer
    must apply to the ``from_version`` table to obtain ``to_version``
    (Delta CDF / Iceberg changelog-scan semantics, reconstructed from
    the manifests alone, no extra write-side bookkeeping).

    Returns the data columns (in ``to_version``'s schema) plus
    ``_change_type``:

    - without ``key_cols``: ``insert`` / ``delete`` — the exact
      multiset difference. A row whose multiplicity rose by n appears
      n times as ``insert``; fell by n, n times as ``delete``.
    - with ``key_cols``: a key present on both sides is paired as
      ``update_pre`` (the outgoing rows) / ``update_post`` (the
      incoming rows) instead, matching the upsert that produced it;
      keys only inserted or only deleted keep their labels.

    **Cost is proportional to the CHANGE, not the table**: only files
    that differ between the two manifests are read (immutable data
    files + carry-by-reference manifests make the file diff exact),
    and the multiset diff shuffles only those files' rows. A
    partition-granular upsert that rewrote 1 of 10⁴ partitions reads
    2 partitions' worth of bytes however large the table is. Rows an
    upsert rewrote UNCHANGED cancel in the diff and are (correctly)
    absent from the feed — so a compaction, which rewrites files but
    no rows, yields an EMPTY feed (at the cost of reading the
    compacted partitions; :func:`snapshot_changes_log` skips
    ``compact`` commits outright via the manifest's ``operation``
    field instead of reading them).

    Changes are expressed in the TARGET version's schema (the
    manifest schema authority): after an evolution, outgoing rows
    read NULL for columns that didn't exist yet, and columns dropped
    from the target schema are absent from the feed. Columns must be
    groupable (no map type — same restriction Spark's own
    ``except_all`` carries).

    ``columns`` restricts the feed to a projection BEFORE diffing:
    the parquet scans read only those columns (column pruning at the
    change-feed level — diffing a 2-column index feed over a
    100-column table reads 2 columns' bytes), and commits that only
    touched OTHER columns correctly net to an empty feed. The
    projection must include ``key_cols``.

    The feed is the bridge from the table format to the engine's
    index-maintenance loops: feed ``insert``/``update_post`` rows to
    ``bm25_index_batch``/``ivf_append_batch`` and
    ``delete``/``update_pre`` rows to the matching delete loop and a
    derived index follows the table exactly-once (see
    :func:`~..streaming.ingest.bm25_sync_snapshot`)."""
    if to_version is None:
        to_version = latest_version(spark, path)
        if to_version is None:
            raise FileNotFoundError(
                f"no published snapshot under {path}")
    if from_version > to_version:
        raise ValueError(
            f"from_version {from_version} is newer than to_version "
            f"{to_version}; swap them (the feed is forward-only)")
    m_to = _load_manifest(spark, path, to_version)
    schema_json = m_to.get("schema")
    from pyspark.sql.types import StructType
    schema = StructType.fromJson(json.loads(schema_json)) \
        if schema_json else None
    if columns is not None:
        if schema is not None:
            unknown = [c for c in columns
                       if c not in {f.name for f in schema.fields}]
            if unknown:
                raise ValueError(
                    f"columns {unknown} not in the snapshot's schema")
        if key_cols:
            outside = [k for k in key_cols if k not in columns]
            if outside:
                raise ValueError(
                    f"key_cols {outside} must be included in columns")
    if from_version == to_version:
        if schema is None:
            raise ValueError(
                f"snapshot {to_version} of {path} carries no schema")
        empty = spark.createDataFrame([], schema)
        if columns is not None:
            empty = empty.select(*columns)
        return empty.withColumn(_CHANGE_TYPE, F.lit("insert"))
    m_from = _load_manifest(spark, path, from_version)
    e_from = {e["path"]: e for e in
              _manifest_entries(spark, path, m_from)}
    e_to = {e["path"]: e for e in _manifest_entries(spark, path, m_to)}
    added = [e for p, e in e_to.items() if p not in e_from]
    removed = [e for p, e in e_from.items() if p not in e_to]

    def _side(entries: list[dict]) -> DataFrame:
        if not entries:
            if schema is None:
                raise ValueError(
                    f"snapshot {to_version} of {path} carries no schema")
            empty = spark.createDataFrame([], schema)
            return empty.select(*columns) if columns is not None \
                else empty
        df = _read_files(spark, path, entries, schema_json)
        if columns is not None:
            return df.select(*columns)
        if schema is not None:
            # partition-discovery appends hive columns last; restore
            # the manifest schema's declared order
            df = df.select(*[f.name for f in schema.fields])
        return df

    df_add, df_rem = _side(added), _side(removed)
    cols = df_add.columns
    reserved = {_CHANGE_TYPE, _COMMIT_VERSION} & set(cols)
    if reserved:
        raise ValueError(
            f"table columns collide with change-feed metadata "
            f"columns: {sorted(reserved)}")
    # the multiset diff must treat NULL column values as equal on both
    # sides: a USING-column full_outer join is null-UNSAFE, so an
    # unchanged row carrying a NULL in any projected column inside a
    # rewritten file would never cancel and surface as a phantom
    # insert+delete pair (breaking the "rows an upsert rewrote
    # unchanged cancel in the diff" contract) — join with eqNullSafe
    # per column and coalesce the values from whichever side has them
    add_g = df_add.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("_n_add")).alias("_a")
    rem_g = df_rem.groupBy(*cols).agg(
        F.count(F.lit(1)).alias("_n_rem")).alias("_r")
    on = None
    for c in cols:
        e = F.col(f"_a.{c}").eqNullSafe(F.col(f"_r.{c}"))
        on = e if on is None else on & e
    net = (add_g.join(rem_g, on, "full_outer")
           .select(*[F.coalesce(F.col(f"_a.{c}"), F.col(f"_r.{c}"))
                     .alias(c) for c in cols],
                   "_n_add", "_n_rem")
           .withColumn("_net", F.coalesce("_n_add", F.lit(0))
                       - F.coalesce("_n_rem", F.lit(0)))
           .where(F.col("_net") != 0))
    out = (net.select(
        *cols,
        F.when(F.col("_net") > 0, F.lit("insert"))
        .otherwise(F.lit("delete")).alias(_CHANGE_TYPE),
        F.abs("_net").alias("_n"))
        .withColumn("_i", F.explode(F.expr("sequence(1, _n)")))
        .drop("_i", "_n"))
    if key_cols:
        missing = [k for k in key_cols if k not in cols]
        if missing:
            raise ValueError(f"key_cols {missing} not in the "
                             f"snapshot's columns {cols}")
        w = Window.partitionBy(*key_cols)
        both = (F.max(F.when(F.col(_CHANGE_TYPE) == "insert", 1)
                      .otherwise(0)).over(w)
                + F.max(F.when(F.col(_CHANGE_TYPE) == "delete", 1)
                        .otherwise(0)).over(w)) == 2
        out = out.withColumn(
            _CHANGE_TYPE,
            F.when(both & (F.col(_CHANGE_TYPE) == "insert"),
                   F.lit("update_post"))
            .when(both & (F.col(_CHANGE_TYPE) == "delete"),
                  F.lit("update_pre"))
            .otherwise(F.col(_CHANGE_TYPE)))
    return out


def snapshot_changes_log(spark: SparkSession, path: str,
                         from_version: int,
                         to_version: int | None = None,
                         *, key_cols: list[str] | None = None,
                         columns: list[str] | None = None
                         ) -> DataFrame:
    """Per-commit change feed: :func:`snapshot_changes` applied to
    each consecutive version step in ``(from_version, to_version]``,
    unioned with a ``_commit_version`` column attributing every
    change row to the commit that made it — the audit form (the
    endpoint form nets out intermediate churn; this one shows it).

    Commits whose manifest records ``operation: "compact"`` or a
    replayed-batch no-op are row-neutral BY CONSTRUCTION and are
    skipped without reading their files. Every intermediate manifest
    must still exist — run within the :func:`snapshot_prune`
    retention window or from a version it retained."""
    if to_version is None:
        to_version = latest_version(spark, path)
        if to_version is None:
            raise FileNotFoundError(
                f"no published snapshot under {path}")
    out = None
    for v in range(from_version + 1, to_version + 1):
        if _load_manifest(spark, path, v).get("operation") == "compact":
            continue
        step = (snapshot_changes(spark, path, v - 1, v,
                                 key_cols=key_cols, columns=columns)
                .withColumn(_COMMIT_VERSION, F.lit(v)))
        out = step if out is None else out.unionByName(step)
    if out is None:
        return (snapshot_changes(spark, path, to_version, to_version,
                                 key_cols=key_cols, columns=columns)
                .withColumn(_COMMIT_VERSION, F.lit(to_version)))
    return out


# -- named refs: tags (r8) --------------------------------------------------

_REFS_DIR = "_refs"


def _validate_ref_name(name: str) -> None:
    import re
    if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]*", name or ""):
        raise ValueError(
            f"invalid tag name {name!r}: letters/digits/._- only, "
            f"must start alphanumeric")


def snapshot_tag(spark: SparkSession, path: str, name: str,
                 version: int | None = None, *,
                 overwrite: bool = False) -> int:
    """Pin a snapshot version under a NAME — ``v2-train-release``
    instead of "version 417" in every downstream config. Tags are
    refs the way table formats mean them: a tagged version's manifest
    AND data files survive :func:`snapshot_prune`'s retention window
    until the tag is deleted, so a pinned training-data release stays
    readable for exactly as long as something names it. Creation is
    atomic (exclusive create of ``_refs/<name>.json``); re-pointing an
    existing tag requires ``overwrite=True`` and is delete+create
    (a concurrent reader between the two sees "no such tag", never a
    torn ref). Returns the pinned version."""
    import time

    _validate_ref_name(name)
    if version is None:
        version = latest_version(spark, path)
        if version is None:
            raise FileNotFoundError(
                f"no published snapshot under {path}")
    jvm, fs, _ = _fs(spark, path)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(
            f"{path}/{_MANIFEST_DIR}/{version}.json")):
        raise FileNotFoundError(
            f"version {version} of {path} does not exist (pruned?)")
    ref = f"{path}/{_REFS_DIR}/{name}.json"
    body = json.dumps({"version": version, "created_at": time.time()},
                      sort_keys=True)
    if overwrite:
        fs.delete(jvm.org.apache.hadoop.fs.Path(ref), False)
    try:
        _write_text(spark, ref, body)
    except Exception as e:
        if _is_exists_error(e):
            raise ValueError(
                f"tag {name!r} already exists on {path}; pass "
                f"overwrite=True to re-point it") from e
        raise
    return version


def snapshot_tags(spark: SparkSession, path: str) -> dict[str, int]:
    """All tags on the table: ``{name: version}``."""
    jvm, fs, _ = _fs(spark, path)
    d = jvm.org.apache.hadoop.fs.Path(f"{path}/{_REFS_DIR}")
    if not fs.exists(d):
        return {}
    out = {}
    for st in fs.listStatus(d):
        n = st.getPath().getName()
        if n.endswith(".json") and not n.startswith("."):
            try:
                out[n[:-len(".json")]] = json.loads(_read_text(
                    spark, f"{path}/{_REFS_DIR}/{n}"))["version"]
            except Exception:
                continue               # torn concurrent re-point
    return out


def snapshot_untag(spark: SparkSession, path: str, name: str) -> None:
    """Delete a tag. The version it pinned becomes subject to normal
    :func:`snapshot_prune` retention again."""
    _validate_ref_name(name)
    jvm, fs, _ = _fs(spark, path)
    if not fs.delete(jvm.org.apache.hadoop.fs.Path(
            f"{path}/{_REFS_DIR}/{name}.json"), False):
        raise FileNotFoundError(f"no tag {name!r} on {path}")
