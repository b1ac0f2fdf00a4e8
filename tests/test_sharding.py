"""Deterministic sharding + weighted interleaving
(operators/sharding.py): reproducibility across partitionings,
shard balance, positional density, and the weighted-prefix property
of the interleave schedule."""

import pytest
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.sharding import (
    assign_shards,
    interleave_key,
)


def _docs(spark, n=400):
    return spark.range(0, n).select(F.col("id").alias("doc_id"))


def test_shard_assignment_reproducible_across_partitionings(spark):
    docs = _docs(spark)
    a = {
        (r.doc_id): (r.shard, r.pos)
        for r in assign_shards(docs, "doc_id", 8).collect()
    }
    b = {
        (r.doc_id): (r.shard, r.pos)
        for r in assign_shards(docs.repartition(13), "doc_id", 8).collect()
    }
    assert a == b


def test_positions_dense_per_shard(spark):
    rows = assign_shards(_docs(spark), "doc_id", 8).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_shards_roughly_balanced(spark):
    rows = assign_shards(_docs(spark, 4000), "doc_id", 8).collect()
    sizes = {}
    for r in rows:
        sizes[r.shard] = sizes.get(r.shard, 0) + 1
    assert len(sizes) == 8
    # md5-uniform: each shard ~500 ± sampling error (sd ≈ 21)
    assert all(380 <= s <= 620 for s in sizes.values()), sizes


def test_interleave_prefix_respects_weights(spark):
    docs = _docs(spark, 900).withColumn(
        "src",
        F.when(F.col("doc_id") % 3 == 0, "a")
        .when(F.col("doc_id") % 3 == 1, "b")
        .otherwise("c"),
    )
    keyed = interleave_key(docs, "src", "doc_id", {"a": 6, "b": 2, "c": 1})
    head = (
        keyed.orderBy("schedule_key", "__draw", "doc_id").limit(180).collect()
    )
    counts = {}
    for r in head:
        counts[r.src] = counts.get(r.src, 0) + 1
    # weights 6:2:1 over 180 → expect ~120/40/20 (exact for the
    # deterministic round-robin up to boundary ties)
    assert abs(counts["a"] - 120) <= 6, counts
    assert abs(counts["b"] - 40) <= 4, counts
    assert abs(counts["c"] - 20) <= 4, counts


def test_interleave_key_exact_integer(spark):
    docs = _docs(spark, 30).withColumn("src", F.lit("a"))
    rows = interleave_key(docs, "src", "doc_id", {"a": 7}).collect()
    step = 720720 // 7
    assert all(r.schedule_key == r.rank_in_source * step for r in rows)


def test_interleave_rejects_non_divisor_weight(spark):
    docs = _docs(spark, 10).withColumn("src", F.lit("a"))
    with pytest.raises(ValueError):
        interleave_key(docs, "src", "doc_id", {"a": 17})


def test_interleave_keeps_null_source_rows(spark):
    """Round-12 ADVICE regression: the offsets join must be null-safe
    — rows whose source is NULL form their own rank block with the
    coalesce fallback weight 1, they are NOT silently dropped."""
    docs = _docs(spark, 60).withColumn(
        "src", F.when(F.col("doc_id") % 4 == 0, F.lit(None)).otherwise("a")
    )
    keyed = interleave_key(docs, "src", "doc_id", {"a": 3})
    rows = keyed.collect()
    assert len(rows) == 60  # no row loss
    null_rows = [r for r in rows if r.src is None]
    assert len(null_rows) == 15
    # unknown (incl. NULL) sources get weight 1 → step == scale, and
    # ranks within the NULL block are dense from 1
    assert sorted(r.rank_in_source for r in null_rows) == list(
        range(1, 16)
    )
    assert all(
        r.schedule_key == r.rank_in_source * 720720 for r in null_rows
    )
