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


def resolve_paths(folders: DataFrame, paths: DataFrame) -> DataFrame:
    """Resolve every ``paths.path`` ('/'-separated, no blank segments)
    against the ``folders`` catalog. Output: (path, folder_id), with
    NULL folder_id when any segment is missing.

    ``max_depth`` joins total (a bounded scalar — path depth, not data
    size); the catalog side is broadcast at every level.
    """
    parts = F.split(F.col("path"), "/")
    cur = paths.select(
        "path",
        parts.alias("parts"),
        F.size(parts).alias("depth"),
        F.lit(None).cast("long").alias("cur_id"),
        F.lit(True).alias("alive"),
    )
    max_depth = cur.agg(F.max("depth")).collect()[0][0] or 0

    f = F.broadcast(
        folders.select(
            F.col("folder_id").alias("__fid"),
            F.col("parent_id").alias("__pid"),
            F.col("name").alias("__name"),
        )
    )
    for lvl in range(max_depth):
        seg = F.element_at(F.col("parts"), lvl + 1)
        walking = cur.filter(F.col("alive") & (F.col("depth") > lvl))
        parked = cur.filter(~(F.col("alive") & (F.col("depth") > lvl)))
        stepped = walking.join(
            f,
            F.col("cur_id").eqNullSafe(F.col("__pid")) & (seg == F.col("__name")),
            "left",
        ).select(
            "path",
            "parts",
            "depth",
            F.col("__fid").alias("cur_id"),
            (F.col("alive") & F.col("__fid").isNotNull()).alias("alive"),
        )
        cur = stepped.unionByName(parked)
    return cur.select(
        "path", F.when(F.col("alive"), F.col("cur_id")).alias("folder_id")
    )


class PathResolver:
    """Driver-side memoizing facade over :func:`resolve_paths` — the
    reference's ``DrivePathResolver`` cache semantics (:56-71): a
    resolved path is never re-walked within the resolver's lifetime.
    """

    def __init__(self, folders: DataFrame):
        self._folders = folders
        self._cache: dict[str, int | None] = {}

    @property
    def cache(self) -> dict[str, int | None]:
        return dict(self._cache)

    def resolve(self, paths: list[str]) -> dict[str, int | None]:
        """Resolve a batch; cache hits skip the dataflow entirely."""
        misses = sorted({p for p in paths if p not in self._cache})
        if misses:
            spark = self._folders.sparkSession
            miss_df = spark.createDataFrame([(p,) for p in misses], "path string")
            for row in resolve_paths(self._folders, miss_df).collect():
                self._cache[row.path] = row.folder_id
        return {p: self._cache[p] for p in paths}
