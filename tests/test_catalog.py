"""S7 path-catalog resolution + the memoizing resolver facade."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.sources.catalog import PathResolver, resolve_paths

FOLDERS = [
    (1, None, "A"),
    (2, 1, "B"),
    (3, 2, "C"),
    (4, None, "X"),
    (5, 1, "C"),   # same name under a different parent
]


def _folders(spark):
    return spark.createDataFrame(FOLDERS, "folder_id long, parent_id long, name string")


def test_resolve_paths_walk_and_misses(spark):
    paths = ["A", "A/B", "A/B/C", "A/C", "X", "A/missing", "nope", "X/B"]
    out = {
        r.path: r.folder_id
        for r in resolve_paths(
            _folders(spark),
            spark.createDataFrame([(p,) for p in paths], "path string"),
        ).collect()
    }
    assert out == {
        "A": 1, "A/B": 2, "A/B/C": 3, "A/C": 5, "X": 4,
        "A/missing": None, "nope": None, "X/B": None,
    }


def test_same_name_disambiguated_by_parent(spark):
    out = {
        r.path: r.folder_id
        for r in resolve_paths(
            _folders(spark),
            spark.createDataFrame([("A/B/C",), ("A/C",)], "path string"),
        ).collect()
    }
    assert out == {"A/B/C": 3, "A/C": 5}  # both 'C' folders, right parents


def test_path_resolver_memoizes_every_prefix(spark):
    r = PathResolver(_folders(spark))
    first = r.resolve(["A/B", "A/missing"])
    assert first == {"A/B": 2, "A/missing": None}
    # reference semantics: every resolved PREFIX is cached too
    assert r.cache == {"A": 1, "A/B": 2, "A/missing": None}

    # child of a cached prefix resolves by walking only the suffix
    assert r.resolve(["A/B/C"]) == {"A/B/C": 3}
    assert r.cache["A/B/C"] == 3

    # cache hit: poison the folders frame — a re-walk would now fail,
    # so a correct answer proves no dataflow ran
    r._folders = r._folders.filter(F.lit(False))
    assert r.resolve(["A/B", "A/B/C"]) == {"A/B": 2, "A/B/C": 3}

    # a new path DOES hit the (now empty) catalog and resolves to None
    assert r.resolve(["X"]) == {"X": None}


def test_path_resolver_dead_prefix_short_circuits(spark):
    r = PathResolver(_folders(spark))
    assert r.resolve(["nope/deeper"]) == {"nope/deeper": None}
    assert r.cache["nope"] is None
    # children of a dead cached prefix resolve to None without dataflow
    r._folders = r._folders.filter(F.lit(False))
    assert r.resolve(["nope/deeper/still"]) == {"nope/deeper/still": None}


def test_resolve_paths_deep_path_linear_plan(spark):
    """A 40-segment path must build a LINEAR plan (one join per
    level), not fork a union per level (2^40 nodes would hang
    analysis long before execution)."""
    deep = "/".join(["A"] + ["x"] * 39)
    out = resolve_paths(
        _folders(spark),
        spark.createDataFrame([(deep,), ("A/B",)], "path string"),
    ).collect()
    got = {r.path: r.folder_id for r in out}
    assert got == {deep: None, "A/B": 2}


def test_resolve_paths_duplicate_catalog_rows_first_wins(spark):
    dup = _folders(spark).unionByName(
        spark.createDataFrame([(99, 1, "B")],
                              "folder_id long, parent_id long, name string")
    )
    out = resolve_paths(
        dup, spark.createDataFrame([("A/B",)], "path string")
    ).collect()
    # exactly ONE row per input path; min folder_id wins deterministically
    assert [(r.path, r.folder_id) for r in out] == [("A/B", 2)]


def test_path_resolver_large_batch_linear_time(spark):
    """The docstring advertises million-path batches: driver-side
    batch prep must be O(P), not O(P^2) (the old per-prefix linear
    scan of the pending list took minutes at 10k paths). 10k distinct
    uncached 2-level paths -> 20k prefixes; generous absolute bound
    catches only a quadratic blow-up, not machine noise."""
    import time

    r = PathResolver(_folders(spark))
    paths = [f"A/child{i:05d}" for i in range(5000)] + [
        f"root{i:05d}/leaf" for i in range(5000)
    ]
    t0 = time.monotonic()
    out = r.resolve(paths)
    elapsed = time.monotonic() - t0
    assert len(out) == 10000
    assert out["A/child00000"] is None and out["root00000/leaf"] is None
    assert len(r.cache) >= 10001  # every prefix cached (incl. 'A')
    assert elapsed < 120, f"large-batch resolve took {elapsed:.1f}s"
