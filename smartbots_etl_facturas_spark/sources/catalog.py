"""S7 — path catalog resolution (the reference's Drive path resolver
as dataflow).

Reference: smartbots-etl/src/infrastructure/drive_path_resolver.py
:51-72 (``resolve_path``: walk '/'-separated segments from the root,
one folder lookup per segment, memoizing every resolved PREFIX) and
:74-93 (``ensure_path``: same walk, creating missing folders).

Engine re-expression: the folder hierarchy is a TABLE
``(folder_id, parent_id, name)`` (parent_id NULL = root level), and a
BATCH of paths resolves in one plan — per segment level, one
broadcast join of the still-alive paths against the catalog (the
reference's per-segment ``_find_folder`` API call, re-shaped as a
set-based join so a million paths cost ``max_depth`` joins, not a
million API walks). Unresolvable paths yield NULL folder_id (the
reference raises per path; errors-as-data, SURVEY §2.2 P10).

:class:`PathResolver` adds the reference's prefix memo cache on the
driver: repeated resolutions of the same (or a child) path skip the
joins entirely — exactly the role ``self._cache`` plays at
drive_path_resolver.py:56-71.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESOLVED_SCHEMA = "path string, folder_id long"


def resolve_paths(
    folders: DataFrame,
    paths: DataFrame,
    start_col: str | None = None,
    walk_col: str | None = None,
) -> DataFrame:
    """Resolve every ``paths.path`` ('/'-separated, no blank segments)
    against the ``folders`` catalog. Output: (path, folder_id), with
    NULL folder_id when any segment is missing.

    ``max_depth`` joins total (a bounded scalar — path depth, not data
    size), ONE plan reference per level — a finished/dead row simply
    rides through each join unmatched (its join predicate is false),
    so the logical plan grows linearly with depth, never forks into a
    union per level. The catalog side is deduplicated to the MINIMUM
    folder_id per (parent_id, name) — the deterministic analogue of
    the reference taking the first Drive API match — and broadcast at
    every level.

    ``start_col`` (optional, a long column in ``paths``): resolve
    under that folder id instead of from the root; ``walk_col``
    (optional, a string column) holds the segments actually walked
    when they differ from ``path`` (the key column) — together the
    hook :class:`PathResolver` uses to start walks from a memoized
    prefix.
    """
    parts = F.split(F.col(walk_col or "path"), "/")
    start = F.col(start_col) if start_col else F.lit(None).cast("long")
    cur = paths.select(
        "path",
        parts.alias("parts"),
        F.size(parts).alias("depth"),
        start.alias("cur_id"),
        F.lit(True).alias("alive"),
    )
    max_depth = cur.agg(F.max("depth")).collect()[0][0] or 0

    f = F.broadcast(
        folders.groupBy(
            F.col("parent_id").alias("__pid"), F.col("name").alias("__name")
        ).agg(F.min("folder_id").alias("__fid"))
    )
    for lvl in range(max_depth):
        # try_element_at: the predicate is evaluated for finished rows
        # too (their `walking` guard is false, but ANSI element_at
        # would still throw on the out-of-bounds index)
        seg = F.try_element_at(F.col("parts"), F.lit(lvl + 1))
        walking = F.col("alive") & (F.col("depth") > F.lit(lvl))
        cur = cur.join(
            f,
            walking
            & F.col("cur_id").eqNullSafe(F.col("__pid"))
            & (seg == F.col("__name")),
            "left",
        ).select(
            "path",
            "parts",
            "depth",
            F.when(walking, F.col("__fid")).otherwise(F.col("cur_id")).alias("cur_id"),
            F.when(walking, F.col("__fid").isNotNull()).otherwise(F.col("alive")).alias("alive"),
        )
    return cur.select(
        "path", F.when(F.col("alive"), F.col("cur_id")).alias("folder_id")
    )


class PathResolver:
    """Driver-side memoizing facade over :func:`resolve_paths` — the
    reference's ``DrivePathResolver`` cache semantics (:56-71): every
    resolved PREFIX is cached, a cached path is never re-walked, and
    a child of a cached prefix walks only its remaining segments
    (``start_col`` hook).
    """

    def __init__(self, folders: DataFrame):
        self._folders = folders
        self._cache: dict[str, int | None] = {}

    @property
    def cache(self) -> dict[str, int | None]:
        return dict(self._cache)

    def resolve(self, paths: list[str]) -> dict[str, int | None]:
        """Resolve a batch; cache hits skip the dataflow entirely and
        misses walk from their longest already-cached prefix. All
        uncached prefixes resolve (and are cached) in ONE batch — the
        per-level joins are shared across the whole batch, so cost
        stays max_depth joins regardless of batch size."""
        rows: list[tuple[str, str, int | None]] = []
        pending: set[str] = set()  # O(1) dedup — keeps resolve() linear
        for p in sorted({q for q in paths if q not in self._cache}):
            segs = p.split("/")
            for i in range(1, len(segs) + 1):
                pref = "/".join(segs[:i])
                if pref in self._cache or pref in pending:
                    continue
                # longest PREVIOUSLY cached proper prefix of `pref`
                start_id, start_len = None, 0
                for j in range(i - 1, 0, -1):
                    pp = "/".join(segs[:j])
                    if pp in self._cache:
                        start_id, start_len = self._cache[pp], j
                        break
                if start_len and start_id is None:
                    self._cache[pref] = None  # dead prefix → dead child
                    continue
                pending.add(pref)
                rows.append((pref, "/".join(segs[start_len:i]), start_id))
        if rows:
            spark = self._folders.sparkSession
            miss_df = spark.createDataFrame(
                rows, "path string, __walk string, __start long"
            )
            resolved = resolve_paths(
                self._folders, miss_df, start_col="__start", walk_col="__walk"
            )
            for row in resolved.collect():
                self._cache[row.path] = row.folder_id
        return {p: self._cache[p] for p in paths}
