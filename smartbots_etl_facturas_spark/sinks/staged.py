"""S11 — staged write + atomic publish with snapshot retention.

The reference snapshots the consolidated file before writing and
restores it on failure (file_lifecycle_manager.py:35-189; rollback at
consolidate_invoices.py:147-155). The engine equivalent: every publish
writes a NEW versioned directory, then atomically flips a _CURRENT
pointer file; previous versions remain on disk as snapshots, so
rollback is a pointer flip — never a data rewrite. Readers resolve
the pointer first, so a crashed half-written version is invisible.

The check-then-publish ordering (reconcile BEFORE flipping the
pointer) is the caller's responsibility — see publish(check=...).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession

_CURRENT = "_CURRENT"
_HISTORY = "_HISTORY"
_PUBLISH_LOCK = "_PUBLISH_LOCK"

#: sentinel distinguishing "no CAS requested" from "expect no current
#: version" (expected_version=None) on publish().
_NO_CAS = object()


class PublishConflictError(RuntimeError):
    """Raised by :func:`publish` when ``expected_version`` no longer
    matches the table's current pointer — another writer published in
    between. The loser's version directory is left on disk, never
    flipped, never readable (same forensics rule as a failed check).

    Concurrency contract of every versioned table (ANN segment
    manifests, minhash/BM25/pHash/audio-fp postings, audit snapshots):
    SINGLE WRITER per table. Two concurrent incremental ingests must
    serialize externally; passing ``expected_version`` turns the silent
    last-wins overwrite into this loud failure so the losing ingest can
    re-read and retry instead of having its flip dropped."""


def _pointer_path(base: str) -> str:
    return os.path.join(base, _CURRENT)


def _history_path(base: str) -> str:
    return os.path.join(base, _HISTORY)


def _published_versions(base: str) -> list[str]:
    """Versions that were actually pointer-flipped, in first-publish
    order (the _HISTORY flip log, deduplicated — rollback re-flips an
    old version without re-publishing it). Directories that were never
    flipped (crashed half-writes, check-rejected publishes kept for
    forensics) are NOT in this list and must never be readable."""
    try:
        with open(_history_path(base)) as fh:
            seen: dict[str, None] = {}
            for line in fh:
                v = line.strip()
                if v:
                    seen.setdefault(v, None)
            # dict preserves insertion order == flip-log append order,
            # so this IS first-publish order even if two publishes from
            # different processes minted ids in the same wall-clock
            # second (rollback below depends on this, not on sorting).
            return list(seen)
    except FileNotFoundError:
        return []


def current_version(base: str) -> str | None:
    try:
        with open(_pointer_path(base)) as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def _flip_pointer(base: str, version: str) -> None:
    tmp = _pointer_path(base) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(version)
    os.replace(tmp, _pointer_path(base))  # atomic on POSIX


def _acquire_publish_lock(base: str, timeout: float = 30.0) -> str:
    """O_EXCL lock file serializing the check-and-flip critical section
    of a CAS publish. Local-filesystem scope (same box), matching the
    sink's single-box layout; a crashed holder is detected by age and
    broken after ``timeout`` so a stale lock cannot wedge ingestion."""
    lock = os.path.join(base, _PUBLISH_LOCK)
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
            return lock
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(lock) > timeout:
                    os.unlink(lock)  # stale holder: break the lock
                    continue
            except FileNotFoundError:
                continue
            if time.monotonic() > deadline:
                raise PublishConflictError(
                    f"publish lock under {base} held past {timeout}s"
                ) from None
            time.sleep(0.05)


def publish(df: DataFrame, base: str, check=None,
            expected_version=_NO_CAS) -> str:
    """Write df as a new version and flip the pointer atomically.

    ``check``: optional callable run on the WRITTEN data (re-read from
    disk) before the pointer flips — the reconcile-before-publish
    hook. Raise inside it to abort: the pointer keeps pointing at the
    previous good version and the rejected version dir is left for
    forensics (never referenced by any reader).

    ``expected_version``: optional compare-and-swap guard. When passed
    (a version id, or ``None`` meaning "expect no published version
    yet"), the flip happens only if the current pointer still matches;
    otherwise :class:`PublishConflictError` — a concurrent writer won.
    The check-and-flip pair runs under an exclusive lock file so two
    CAS publishers can never both pass the comparison. Without it the
    flip is last-wins (the historical behavior, fine for the
    single-writer tables).
    """
    os.makedirs(base, exist_ok=True)
    # zero-padded wall-clock EPOCH ns so lexicographic order matches
    # publish order even across process restarts (monotonic_ns is
    # process-relative and would interleave wrongly between writers);
    # the authoritative order is still the _HISTORY flip log — the id
    # only needs uniqueness + human readability.
    version = f"v{time.strftime('%Y%m%d-%H%M%S')}-{time.time_ns():020d}"
    target = os.path.join(base, version)
    df.write.mode("error").parquet(target)
    if check is not None:
        written = df.sparkSession.read.parquet(target)
        check(written)
    if expected_version is _NO_CAS:
        with open(_history_path(base), "a") as fh:
            fh.write(version + "\n")
        _flip_pointer(base, version)
        return version
    lock = _acquire_publish_lock(base)
    try:
        actual = current_version(base)
        if actual != expected_version:
            raise PublishConflictError(
                f"publish CAS failed under {base}: expected current "
                f"version {expected_version!r}, found {actual!r} — a "
                f"concurrent writer published first; re-read and retry"
            )
        with open(_history_path(base), "a") as fh:
            fh.write(version + "\n")
        _flip_pointer(base, version)
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
    return version


def read_published(spark: SparkSession, base: str) -> DataFrame:
    version = current_version(base)
    if version is None:
        raise FileNotFoundError(f"no published version under {base}")
    return spark.read.parquet(os.path.join(base, version))


def read_version(spark: SparkSession, base: str, version: str) -> DataFrame:
    """Time-travel read: any retained snapshot by version id (from
    :func:`list_versions`), independent of where the _CURRENT pointer
    points — the Delta/Iceberg ``VERSION AS OF`` equivalent on the
    versioned-publish layout. Reading a half-written or reaped
    directory is impossible: only pointer-flipped versions are listed,
    and a version is immutable once published."""
    target = os.path.join(base, version)
    if version not in _published_versions(base) or not os.path.isdir(target):
        raise FileNotFoundError(f"no published version {version!r} under {base}")
    return spark.read.parquet(target)


def list_versions(base: str) -> list[str]:
    """PUBLISHED versions only (pointer-flip log ∩ on-disk dirs) —
    never-flipped forensic directories are excluded, so rollback and
    time travel can only ever target good snapshots. Falls back to
    the directory listing for layouts written before the flip log
    existed."""
    published = _published_versions(base)
    if published:
        return [v for v in published
                if os.path.isdir(os.path.join(base, v))]
    return sorted(
        d for d in os.listdir(base)
        if d.startswith("v") and os.path.isdir(os.path.join(base, d))
    )


def rollback(base: str) -> str:
    """Point back at the previous retained snapshot (S11 restore).

    "Previous" is defined by FLIP-LOG position (first-publish order),
    not lexicographic version-id order, so same-second publishes from
    different processes can never make rollback target the wrong
    snapshot."""
    versions = list_versions(base)
    cur = current_version(base)
    if cur is not None and cur in versions:
        prior = versions[: versions.index(cur)]
    else:
        prior = versions
    if not prior:
        raise RuntimeError(f"no snapshot to roll back to under {base}")
    _flip_pointer(base, prior[-1])
    return prior[-1]


def compact_published(
    spark: SparkSession,
    base: str,
    target_files: int | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    check=None,
) -> str:
    """Small-file compaction THROUGH the versioned sink: re-publish the
    current version coalesced to ``target_files`` parquet files
    (default: sized from the current version's on-disk bytes at
    ``target_bytes`` per file, the scan-split sweet spot).

    Readers are never disturbed — the pointer flips atomically to the
    compacted version, the fragmented one stays as a snapshot. This is
    the maintenance loop a long-running incremental pipeline needs:
    every per-file append adds small files; periodic compaction
    restores large scan splits without pausing ingestion or readers.
    ``coalesce`` (not repartition) keeps it shuffle-free: compaction
    only ever REDUCES file count, so map-side merge suffices.
    """
    version = current_version(base)
    if version is None:
        raise FileNotFoundError(f"no published version under {base}")
    if target_files is None:
        vdir = os.path.join(base, version)
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(vdir) for f in fs
        )
        target_files = max(1, -(-size // target_bytes))
    df = read_published(spark, base).coalesce(int(target_files))
    return publish(df, base, check=check)


def parquet_file_count(base: str) -> int:
    """Data-file count of the CURRENT published version (diagnostic)."""
    version = current_version(base)
    vdir = os.path.join(base, version or "")
    return sum(
        1 for r, _, fs in os.walk(vdir) for f in fs
        if f.endswith(".parquet")
    )
