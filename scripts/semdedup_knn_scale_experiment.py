#!/usr/bin/env python
"""32x scale evidence for the round-13 corpus-scale vector operators
(semantic_dedup, knn_join) under an OUTPUT-CONTROLLED replication
protocol.

Naive K-replication copies every vector verbatim, so each vector gains
K-1 exact twins: the TRUE near-dup output grows ~K^2/2 pairs per
original group and any dedup measurement conflates "the plan scaled"
with "the answer itself exploded". This harness instead SIGN-FLIPS
each replica with a deterministic per-(replica, component) Rademacher
pattern:

  v'_j = s_j * v_j,   s_j = +/-1 from murmur3(replica, j), s_0 = +1

Sign-flips are an isometry applied uniformly within a replica, so
every WITHIN-replica inner product — and therefore every within-replica
cosine and bucket-collision structure — is preserved EXACTLY
(sum s_j^2 a_j b_j = sum a_j b_j). Component 0 is EXEMPT from the
flips because the seeded-twin construction (+0.5 on component 0,
applied by _augmented_embeddings AFTER the replica transform) is not
sign-equivariant there: with s_0 = +1 every twin cosine reproduces the
base value bit-exactly, so the TRUE pair set is exactly K x the base
truth (57 pairs at sf0.1 — the exact-tier count the recall companion
pins at 1.00) and any shortfall in a run is RECALL, cleanly
attributable. CROSS-replica cosines become sum +/- v_j^2, Rademacher-
weighted (measured max ~0.73, under the 0.9 threshold; the twin_pairs
== verified_pairs assertion confirms zero cross-replica survivors).
vec_ids shift by replica*1e9, preserving the %5/%10 augmentation
classes used by _augmented_embeddings.

Measurements (wall = best-of-2 after warmup, noop-forced):

  semantic_dedup  base vs 32x at the REGISTERED knob (bucket_bits=8,
                  tables=16) — the fixed-knob point, where per-bucket
                  occupancy grows ~K and candidate pairs ~K^2: the
                  documented reason bucket_bits is a SCALE KNOB;
                  and at bucket_bits=11 (8x the buckets for 32x the
                  corpus — occupancy grows 4x instead of 32x; the
                  collision model 1-(1-(1-theta/pi)^bits)^tables puts
                  threshold-angle recall ~0.95 at 11 bits x 16 tables
                  vs ~0.71 measured at 13 bits) — the scaled-knob
                  deployment point. Both runs report verified_pairs
                  against the constructed truth of 57*K.

  knn_join        base (n_cells=16, the registered point) vs 32x in
                  three configurations:
                  (a) output-controlled: LEFT fixed at the base
                      replica, corpus 32x, same n_cells — per-left-row
                      candidate mass grows ~K (cells 32x fuller);
                  (b) two-sided full at n_cells=90 ~ 16*sqrt(32) — the
                      c ~ sqrt(n) deployment rule (total ADC work
                      ~ n^1.5);
                  (c) two-sided full at n_cells=512 = 16*32 — the
                      c ~ n rule (per-left-row candidates flat, total
                      work ~ n; probe coverage shrinks to nprobe/c).
                  Index build runs OUTSIDE the timed join (build-once
                  discipline, as bench.py does for every ann_* query).

Writes one JSON line; feeds PERF.md and SCALE32_r13.json.
Run on a QUIET box (no concurrent bench/refloat).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from smartbots_etl_facturas_spark.session import get_spark  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
K = 32
OFFSET = 1_000_000_000


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def build_scaled_embeddings(spark, out_dir: str) -> str:
    """K sign-flipped replicas of the sf0.1 embeddings, 32 files."""
    dest = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(dest):
        return out_dir
    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    reps = spark.range(K).withColumnRenamed("id", "__rep")
    scaled = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__rep") * OFFSET).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, j) -> CASE WHEN __rep = 0 "
                "OR j = 0 OR pmod(hash(CAST(__rep AS INT), j), 2) = 0 "
                "THEN x ELSE -x END)"
            ).alias("embedding"),
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(dest)
    return out_dir


def timed(fn, warm: int = 1, reps: int = 2) -> float:
    for _ in range(warm):
        _force(fn())
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def semdedup_run(spark, sf_dir: str, bucket_bits: int) -> dict:
    from smartbots_etl_facturas_spark.operators.dedup import (
        cluster_representatives,
        cosine_neardup_pairs,
        neardup_clusters,
    )

    params = dict(entrymod.SEMDEDUP_PARAMS)
    params["bucket_bits"] = bucket_bits

    def q():
        aug = entrymod._augmented_embeddings(spark, sf_dir)
        pairs = cosine_neardup_pairs(aug, **params)
        return cluster_representatives(
            neardup_clusters(pairs, aug, id_col="vec_id"), id_col="vec_id"
        )

    sec = timed(q)
    aug = entrymod._augmented_embeddings(spark, sf_dir)
    pairs = cosine_neardup_pairs(aug, **params)
    twin = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1_000_000)
        & (F.col("id_a") % OFFSET == F.col("id_b") % OFFSET - 1_000_000)
    ).count()
    total = pairs.count()
    return {"sec": sec, "bucket_bits": bucket_bits,
            "verified_pairs": total, "twin_pairs": twin}


def knn_index(spark, emb_df, n_cells: int) -> str:
    from smartbots_etl_facturas_spark.operators.ann_index import (
        build_ivfpq_index,
    )

    base = tempfile.mkdtemp(prefix=f"knn32_idx_c{n_cells}_")
    build_ivfpq_index(emb_df, base, n_cells=n_cells, m=16, k_sub=16,
                      train_iters=2)
    return base


def knn_run(spark, left, corpus, idx) -> float:
    from smartbots_etl_facturas_spark.operators.ann_index import (
        knn_join_ivfpq,
    )

    return timed(lambda: knn_join_ivfpq(
        left, corpus, idx, **entrymod.KNN_JOIN_PARAMS))


def semantic_incremental_run(spark, sf_dir: str,
                             bucket_bits: int | None = None) -> dict:
    """Probe-only timing of the incremental embedding index
    (q_semantic_dedup_incremental's construction parametrized by dir):
    index built OUTSIDE the timed loop (the bench ensure_* split),
    the delta (seeded twins) sketched + verified per rep."""
    import tempfile

    from pyspark.sql import functions as SF

    from smartbots_etl_facturas_spark.operators.dedup_index import (
        build_embedding_index,
        embedding_match_against_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        SF.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .alias("embedding"),
    )
    corpus = emb.filter(SF.col("vec_id") % 5 == 0)
    delta = emb.filter(SF.col("vec_id") % 10 == 0).select(
        (SF.col("vec_id") + 1000000).alias("vec_id"),
        SF.expr(
            "concat(array(embedding[0] + CAST(0.5 AS DOUBLE)),"
            " slice(embedding, 2, size(embedding) - 1))"
        ).alias("embedding"),
    )
    base = tempfile.mkdtemp(prefix="seminc32_idx_")
    params = entrymod.SEMDEDUP_PARAMS
    bits = bucket_bits or params["bucket_bits"]
    build_embedding_index(corpus, base, bucket_bits=bits,
                          tables=params["tables"])
    sec = timed(lambda: embedding_match_against_index(
        delta, base, threshold=params["threshold"]))
    n = embedding_match_against_index(
        delta, base, threshold=params["threshold"]).count()
    return {"sec": sec, "matches": n, "bucket_bits": bits}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/semknn32_r13"
    fresh = "--fresh" in sys.argv
    if "--incremental" in sys.argv:
        spark = get_spark("semdedup-incremental-scale32")
        spark.sparkContext.setLogLevel("ERROR")
        build_scaled_embeddings(spark, out_dir)
        print(json.dumps({
            "k": K,
            "semantic_incremental_base":
                semantic_incremental_run(spark, BASE_SF),
            "semantic_incremental_x32_fixed_knob":
                semantic_incremental_run(spark, out_dir),
            "semantic_incremental_x32_scaled_knob":
                semantic_incremental_run(spark, out_dir, bucket_bits=11),
        }))
        return
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("semdedup-knn-scale32")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled_embeddings(spark, out_dir)

    # cross-replica isolation: the max cross-replica cosine between a
    # vector and its 31 flipped copies must sit far below threshold
    emb32 = spark.read.parquet(f"{out_dir}/embeddings.parquet")
    from smartbots_etl_facturas_spark.operators.similarity import (
        _dot,
        with_norm,
    )
    n32 = with_norm(emb32)
    a = n32.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va"),
        F.col("__norm").alias("na"))
    b = n32.filter((F.col("vec_id") % OFFSET < 200)
                   & (F.col("vec_id") >= OFFSET)).select(
        (F.col("vec_id") % OFFSET).alias("ia"),
        F.col("embedding").alias("vb"), F.col("__norm").alias("nb"))
    max_cross = (a.join(b, "ia")
                 .select((_dot(F.col("va"), F.col("vb"))
                          / (F.col("na") * F.col("nb"))).alias("c"))
                 .agg(F.max("c")).collect()[0][0])

    results: dict = {"k": K, "protocol": "sign-flip replicas",
                     "max_cross_replica_cosine": round(max_cross, 4)}

    results["semantic_dedup_base"] = semdedup_run(spark, BASE_SF, 8)
    results["semantic_dedup_x32_fixed_knob"] = semdedup_run(
        spark, out_dir, 8)
    results["semantic_dedup_x32_scaled_knob"] = semdedup_run(
        spark, out_dir, 11)

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    left0 = emb32.filter(F.col("vec_id") < OFFSET)
    idx_base = knn_index(spark, emb, 16)
    results["knn_join_base"] = {
        "sec": knn_run(spark, emb, emb, idx_base), "n_cells": 16,
        "left_rows": emb.count()}
    idx32_16 = knn_index(spark, emb32, 16)
    results["knn_join_x32_fixed_left"] = {
        "sec": knn_run(spark, left0, emb32, idx32_16), "n_cells": 16,
        "left_rows": left0.count(),
        "setup": "output-controlled: base-replica left vs 32x corpus"}
    idx32_90 = knn_index(spark, emb32, 90)
    results["knn_join_x32_sqrt_cells"] = {
        "sec": knn_run(spark, emb32, emb32, idx32_90), "n_cells": 90,
        "left_rows": emb32.count(),
        "setup": "two-sided full, c ~ sqrt(n) deployment rule"}
    idx32_512 = knn_index(spark, emb32, 512)
    results["knn_join_x32_linear_cells"] = {
        "sec": knn_run(spark, emb32, emb32, idx32_512), "n_cells": 512,
        "left_rows": emb32.count(),
        "setup": "two-sided full, c ~ n rule (per-row candidates flat)"}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
