"""Video near-dup dedup: per-frame perceptual-hash sequences matched
by a keyed (frame_idx, band, slice) join — the fourth modality member
completing the near-dup quad (text: operators/dedup.py minhash/simhash,
image: operators/phash.py, audio: operators/audiofp.py; round-13
verdict #3). Same family shape as each of them: sketch → banded
candidate pairs → persisted postings index → O(Δ) incremental probe.

A video's sketch is the SEQUENCE of integer-DCT pHashes of its sampled
frames (operators/phash.py:phash_bits — exact int64 arithmetic, bit-
reproducible across engines and runs). Frames are hashed
INDEPENDENTLY, which buys the provable locality bound the audio member
has to argue through frame overlap: replacing one frame changes
exactly one (media, frame_idx) hash and nothing else, so an
``n``-frame near-copy with one replaced frame matches its base on
EXACTLY ``n-1`` frames — not ≥, exactly (the other frames are
byte-identical → Hamming 0). Per-frame Hamming tolerance reuses the
measured pHash margins (≤ 6 bits for the +16 patch construction,
cross-family minimum 14, over 250 seeds — tests/test_multimodal.py).

Scale shape at 100 TB: candidates come from the (frame_idx, band,
slice) self/probe equi-join — the pigeonhole-lossless Hamming banding
of phash.py applied per frame position — followed by one keyed
aggregation counting matched frames per pair. Nothing is ever
all-pairs; the join is width-pinned like every banded candidate join
in the repo.

Reference parity note: the reference engine has no media handling at
all — this module exists for the engine's own LLM-data-pipeline
surface; the dedup-by-key ancestor is the J1 insert-only upsert
(consolidate_invoices.py:475-515) generalized to frame sketches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.staged import publish, read_published
from .phash import _band_slices, _to_gray, phash_bits


def video_fingerprints(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    every_n: int = 1,
) -> DataFrame:
    """(id, frame_idx, phash) per SAMPLED frame — Arrow-batched
    mapInPandas over the binary RAWV payload column: decode
    (sources/multimodal.py:rawv_decode), integer grayscale, integer
    pHash per frame. ``every_n`` is the sampling stride (frame_idx
    keeps the ORIGINAL frame position so indexes built at one stride
    stay probe-compatible). Only the fingerprint rows leave the
    executor — the pixel data never moves."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
    ])
    step = int(every_n)
    if step < 1:
        raise ValueError("every_n must be >= 1")

    def _batches(batches):
        import pandas as pd

        from smartbots_etl_facturas_spark.sources.multimodal import (
            rawv_decode,
        )

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                frames = rawv_decode(bytes(payload))
                for j in range(0, frames.shape[0], step):
                    ids.append(int(mid))
                    idxs.append(j)
                    hashes.append(phash_bits(_to_gray(frames[j])))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "phash": hashes}
            )

    return df.mapInPandas(_batches, out_schema)


def vfp_near_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    max_distance: int = 7,
    bands: int = 8,
    min_frames: int = 7,
) -> DataFrame:
    """Near-duplicate video pairs (id_a, id_b, n_matched ≥ min_frames)
    where n_matched counts frame positions whose pHashes sit within
    ``max_distance`` Hamming bits. Candidates from the
    (frame_idx, band, slice) self-equi-join — lossless per frame for
    ``max_distance < bands`` (the phash.py pigeonhole bound) — then
    ONE exact xor+bit_count verify per (pair, frame) and one keyed
    aggregation. Output deduplicated with id_a < id_b, width-pinned.
    """
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= bands={bands}: the banded "
            "join is only lossless for max_distance < bands (pigeonhole)"
        )
    from .linkage import _shuffle_width

    slices = _band_slices("phash", bands)
    keyed = fps.select(
        F.col(id_col), "frame_idx", F.col("phash"),
        F.explode(slices).alias("bs"),
    ).select(
        id_col, "frame_idx", "phash",
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    sp = _shuffle_width(fps.sparkSession)
    left = keyed.select(
        F.col(id_col).alias("id_a"), F.col("phash").alias("h_a"),
        "frame_idx", "band", "slice",
    ).repartition(sp, "frame_idx", "band", "slice")
    right = keyed.select(
        F.col(id_col).alias("id_b"), F.col("phash").alias("h_b"),
        "frame_idx", "band", "slice",
    ).repartition(sp, "frame_idx", "band", "slice")
    cand = (
        left.join(right, on=["frame_idx", "band", "slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "frame_idx", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.filter(hamming <= max_distance)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matched"))
        .filter(F.col("n_matched") >= int(min_frames))
    )


# --- persisted video-fingerprint index (incremental video ingest) ------------


def build_vfp_index(
    fps: DataFrame,
    base: str,
    id_col: str = "media_id",
    bands: int = 8,
) -> dict[str, str]:
    """Persist the corpus's per-frame Hamming-band postings
    (corpus_id, frame_idx, band, slice) plus the per-frame hash table
    and a 1-row geometry meta table through the versioned sink — the
    video member of the build-once/probe-many family (text:
    dedup_index.py, image: phash.build_phash_index, audio:
    audiofp.build_afp_index, vectors: ann_index.py). A delta video
    batch fingerprints ONLY ITSELF and equi-joins the stored postings,
    so per-ingest cost is O(|Δ| frames + candidates) at any corpus
    size. The band split is pinned in meta so probes can never mix
    geometries."""
    slices = _band_slices("phash", bands)
    postings = fps.select(
        F.col(id_col).alias("corpus_id"), "frame_idx",
        F.explode(slices).alias("bs"),
    ).select(
        "corpus_id", "frame_idx",
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    hashes = fps.select(
        F.col(id_col).alias("corpus_id"), "frame_idx",
        F.col("phash").alias("phash"),
    )
    meta = fps.sparkSession.createDataFrame([(int(bands),)], "bands int")
    return {
        "postings": publish(postings, os.path.join(base, "postings")),
        "hashes": publish(hashes, os.path.join(base, "hashes")),
        "meta": publish(meta, os.path.join(base, "meta")),
    }


def vfp_index_bands(spark: SparkSession, base: str) -> int:
    """The band count the index was built with."""
    return int(read_published(
        spark, os.path.join(base, "meta")).collect()[0].bands)


def vfp_match_against_index(
    delta_fps: DataFrame,
    base: str,
    id_col: str = "media_id",
    max_distance: int = 7,
    min_frames: int = 7,
) -> DataFrame:
    """Near-duplicate matches (delta_id, corpus_id, n_matched ≥
    min_frames) of a DELTA video batch against the INDEXED corpus:
    only the delta is fingerprinted and band-exploded; the corpus
    contributes its stored postings and (for candidates only) its
    per-frame hashes. ``max_distance < bands`` enforced against the
    index's pinned band count.

    CONTRACT — cross-batch pairs ONLY (the round-13 pin shared by the
    whole incremental probe family: dedup_index.py, phash.py,
    audiofp.py): two near-dup videos in the SAME delta batch are
    invisible to the probe (neither is indexed yet). An
    admit-on-no-match ingest loop must also run :func:`vfp_near_pairs`
    over the delta's own fingerprints (already computed for the probe)
    and union the verdicts; see
    tests/test_multimodal.py::test_vfp_ingest_loop_catches_within_batch_pairs.
    """
    from .linkage import _shuffle_width

    spark = delta_fps.sparkSession
    bands = vfp_index_bands(spark, base)
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= index bands={bands}: the "
            "banded probe is only lossless for max_distance < bands"
        )
    postings = read_published(spark, os.path.join(base, "postings"))
    hashes = read_published(spark, os.path.join(base, "hashes"))
    slices = _band_slices("phash", bands)
    d_keys = delta_fps.select(
        F.col(id_col).alias("delta_id"), "frame_idx",
        F.col("phash").alias("h_d"), F.explode(slices).alias("bs"),
    ).select(
        "delta_id", "frame_idx", "h_d",
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    sp = _shuffle_width(spark)
    cand = (
        d_keys.repartition(sp, "frame_idx", "band", "slice")
        .join(postings.repartition(sp, "frame_idx", "band", "slice"),
              on=["frame_idx", "band", "slice"])
        .filter(F.col("delta_id") != F.col("corpus_id"))
        .select("delta_id", "corpus_id", "frame_idx", "h_d")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_d").bitwiseXOR(F.col("phash")))
    return (
        cand.join(hashes, ["corpus_id", "frame_idx"])
        .filter(hamming <= max_distance)
        .groupBy("delta_id", "corpus_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matched"))
        .filter(F.col("n_matched") >= int(min_frames))
    )
