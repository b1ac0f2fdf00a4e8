"""Sequence packing: budget respect, determinism, oversized docs."""

from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.operators.packing import pack_greedy, pack_stats


def _mk(spark, rows, parts=1):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long").repartition(parts)


def test_every_doc_packed_once_and_budget_respected(spark):
    rows = [(i, 100 + (i * 37) % 400) for i in range(200)]
    df = _mk(spark, rows, parts=7)
    packed = pack_greedy(df, budget=1000, num_buckets=4).collect()
    assert len(packed) == 200
    assert {r.doc_id for r in packed} == set(range(200))
    # no pack over budget (no doc here exceeds it alone)
    stats = pack_stats(
        pack_greedy(df, budget=1000, num_buckets=4), budget=1000
    ).collect()
    assert all(r.fill <= 1000 for r in stats)
    assert all(not r.oversized for r in stats)


def test_packing_deterministic_across_partitionings(spark):
    rows = [(i, 50 + (i * 13) % 300) for i in range(300)]
    a = {(r.doc_id, r.pack_id, r.pack_fill)
         for r in pack_greedy(_mk(spark, rows, 1), budget=512).collect()}
    b = {(r.doc_id, r.pack_id, r.pack_fill)
         for r in pack_greedy(_mk(spark, rows, 11), budget=512).collect()}
    assert a == b


def test_oversized_doc_gets_own_pack(spark):
    rows = [(1, 10), (2, 5000), (3, 20)]  # doc 2 alone exceeds budget
    df = _mk(spark, rows)
    packed = pack_greedy(df, budget=100, num_buckets=1, bucket_col=None)
    out = {r.doc_id: (r.pack_id, r.pack_fill) for r in packed.collect()}
    # doc 2 sits alone in its pack; docs 1 and 3 are not in that pack
    pack_of_2 = out[2][0]
    assert out[1][0] != pack_of_2 and out[3][0] != pack_of_2
    stats = {r.pack_id: (r.n_docs, r.fill, r.oversized)
             for r in pack_stats(packed, budget=100).collect()}
    assert stats[pack_of_2] == (1, 5000, True)


def test_next_fit_walk_order_is_id_order(spark):
    # ids 0..5 with tokens 60,60,60,60,60,60 and budget 100 → packs
    # of exactly one doc each pair boundary: [0],[1],... wait 60+60>100
    # so next-fit gives singleton packs in id order
    rows = [(i, 60) for i in range(6)]
    packed = pack_greedy(_mk(spark, rows), budget=100, num_buckets=1).collect()
    by_doc = {r.doc_id: r.pack_id for r in packed}
    assert [by_doc[i] for i in range(6)] == sorted(by_doc[i] for i in range(6))


def test_negative_caller_bucket_still_globally_unique(spark):
    """ADVICE regression: a caller bucket_col from plain hash % B can
    be negative; pack_greedy must pmod it so pack_ids stay
    non-negative and globally unique across buckets."""
    rows = [(i, 100, (-1) ** i * (i % 3)) for i in range(12)]  # buckets -2..2
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, b int")
    out = pack_greedy(df, budget=250, bucket_col="b").collect()
    assert len(out) == 12
    assert all(r.pack_id >= 0 for r in out)
    assert all(r.bucket >= 0 for r in out)
    # same pack_id never spans two distinct source buckets
    by_pack = {}
    for r in out:
        by_pack.setdefault(r.pack_id, set()).add(r.bucket)
    assert all(len(v) == 1 for v in by_pack.values())
