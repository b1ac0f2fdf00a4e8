"""Image perceptual-hash (pHash) near-duplicate detection — the image
twin of text near-dup dedup (round-12 verdict #8): DCT-based 64-bit
perceptual hashes over decoded pixels, Hamming-band candidate
generation (never all-pairs), exact bit_count verification.

The hash is the classic pHash recipe (resize → 2-D DCT-II → low-
frequency 8×8 block → median threshold) computed in EXACT INTEGER
arithmetic: the DCT basis is a fixed-point integer matrix (cosines
scaled by 2^14 and rounded ONCE at module import), pixels are uint8,
and the transform is two int64 matmuls — every coefficient is an
exact integer, so the hash is bit-reproducible across partitionings,
batch sizes and platforms (the same portability discipline as the
md5 MinHash/SimHash tiers; max |coefficient| < 32·2^14·255·32·2^14 ≈
2^46, far inside int64).

Candidate generation reuses the SimHash/MinHash BANDING discipline
(operators/dedup.py:lsh_band_buckets): the 64-bit hash splits into
``bands`` equal bit-slices and candidates come from a (band, slice)
equi-join — by pigeonhole, two hashes within Hamming distance
d < bands share at least one slice, so the banded join is LOSSLESS
for ``max_distance < bands`` while scoring only bucket collisions.

Scale shape: the sketch table is one 64-bit long per image; the join
is keyed on (band, band value) — hot buckets shard across tasks like
any equi-join, and the exact verify is one xor+bit_count per
candidate pair. No stage touches pixels after the sketch pass.

Reference parity note: the reference engine has no image operators —
this module extends the engine's LLM-training-data surface
(SURVEY §2.10), reusing the multimodal PNG codec
(sources/multimodal.py:png_decode) for the pixel path.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "build_phash_index",
    "phash_bits",
    "phash_images",
    "phash_match_against_index",
    "phash_near_pairs",
]

_DCT_N = 32       # resize target and DCT size
_DCT_BLOCK = 8    # low-frequency block kept
_DCT_SCALE = 1 << 14

#: fixed-point DCT-II basis, computed once: C[k][x] =
#: round(2^14 · cos(π·(2x+1)·k / (2·32)))
_DCT_INT = [
    [round(_DCT_SCALE * math.cos(math.pi * (2 * x + 1) * k / (2 * _DCT_N)))
     for x in range(_DCT_N)]
    for k in range(_DCT_N)
]


def phash_bits(gray) -> int:
    """64-bit pHash of one grayscale uint8 image (any h×w ≥ 1):
    nearest-resize to 32×32, integer DCT-II both axes, keep the 8×8
    low-frequency block, threshold the 63 AC coefficients against
    their lower median (bit i∈[1,64) = coeff_i > median; bit 0, the
    DC slot, is always 0). Pure integer arithmetic end to end."""
    import numpy as np

    from ..sources.multimodal import resize_nearest

    g = resize_nearest(np.asarray(gray, dtype=np.int64), _DCT_N, _DCT_N)
    c = np.asarray(_DCT_INT, dtype=np.int64)
    d = c @ g @ c.T                       # exact int64
    block = d[:_DCT_BLOCK, :_DCT_BLOCK].reshape(-1)
    ac = block[1:]                        # drop DC
    med = int(np.sort(ac)[(len(ac) - 1) // 2])   # lower median: exact
    h = 0
    for i, v in enumerate(ac, start=1):
        if int(v) > med:
            h |= 1 << i
    # two's-complement into a signed 64-bit long for the Spark column
    return h - (1 << 64) if h >= (1 << 63) else h


def _to_gray(arr):
    """uint8 (h, w[, ch]) → integer grayscale via the exact BT.601
    integer weights (r·299 + g·587 + b·114) // 1000; alpha ignored."""
    import numpy as np

    a = np.asarray(arr, dtype=np.int64)
    if a.ndim == 2:
        return a
    if a.shape[2] <= 2:          # 1 = gray, 2 = gray+alpha (PIL 'LA')
        return a[:, :, 0]
    r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
    return (r * 299 + g * 587 + b * 114) // 1000


def phash_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    decoder: str = "png",
) -> DataFrame:
    """(id, phash long) per image — Arrow-batched mapInPandas over the
    binary payload column: decode (stdlib PNG codec, or 'pil' when
    Pillow is installed), integer grayscale, integer pHash. Only the
    id and payload columns are read (column pruning reaches the
    scan); the output frame is one long per image."""
    import pandas as pd

    from ..sources.multimodal import png_decode

    if decoder == "pil":  # pragma: no cover - optional dependency
        def _decode(b):
            import io

            from PIL import Image
            import numpy as np

            return np.asarray(Image.open(io.BytesIO(bytes(b))))
    elif decoder == "png":
        def _decode(b):
            return png_decode(bytes(b))
    else:
        raise ValueError("decoder must be 'png' or 'pil'")

    src = df.select(F.col(id_col), F.col(content_col).alias("__content"))

    def _batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            hashes = [
                phash_bits(_to_gray(_decode(b)))
                for b in pdf["__content"]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "phash": hashes})

    return src.mapInPandas(_batches, schema=f"{id_col} long, phash long")


def _band_slices(hash_col: str, bands: int):
    """exploded-array expression of (band, slice) structs — the shared
    band split of the self-join and the persisted-index paths; raises
    when ``bands`` does not divide 64."""
    if 64 % bands != 0:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(hash_col), b * width)
            .bitwiseAND(F.lit(mask)).alias("slice"),
        )
        for b in range(bands)
    ])


def phash_near_pairs(
    sketches: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_distance: int = 7,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs (id_a, id_b, hamming ≤ max_distance)
    from the 64-bit pHash table — BANDED, never all-pairs: the hash
    splits into ``bands`` equal bit-slices, candidates come from a
    (band, slice-value) self-equi-join, and each candidate pair is
    exact-verified with one xor + bit_count. ``max_distance < bands``
    is REQUIRED — that is the pigeonhole bound making the banded join
    lossless (a pair within distance d < bands must agree on ≥ 1
    slice). Output is deduplicated with id_a < id_b."""
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= bands={bands}: the banded "
            "join is only lossless for max_distance < bands (pigeonhole)"
        )
    slices = _band_slices(hash_col, bands)
    keyed = sketches.select(
        F.col(id_col), F.col(hash_col), F.explode(slices).alias("bs")
    ).select(
        id_col, hash_col,
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    # Width pin (the PPJoin/edit-distance discipline,
    # operators/linkage.py round-10): the sketch frames are tiny in
    # bytes but the (band, slice) equi-join EMITS the candidate
    # explosion, so AQE's byte-based coalescing would funnel that work
    # onto a few cores; an explicit repartition by the join key is
    # exempt from coalescing and the join reuses the partitioning.
    from .linkage import _shuffle_width

    sp = _shuffle_width(sketches.sparkSession)
    left = keyed.select(
        F.col(id_col).alias("id_a"), F.col(hash_col).alias("h_a"),
        "band", "slice",
    ).repartition(sp, "band", "slice")
    right = keyed.select(
        F.col(id_col).alias("id_b"), F.col(hash_col).alias("h_b"),
        "band", "slice",
    ).repartition(sp, "band", "slice")
    cand = (
        left.join(right, on=["band", "slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_distance)
        .select("id_a", "id_b", "hamming")
    )


# --- persisted pHash index (incremental image ingest) ------------------------


def build_phash_index(
    sketches: DataFrame,
    base: str,
    id_col: str = "media_id",
    hash_col: str = "phash",
    bands: int = 8,
) -> dict[str, str]:
    """Persist the corpus's Hamming-band postings (corpus_id, band,
    slice) plus the hash table (corpus_id, phash) and a 1-row meta
    table through the versioned sink — the image member of the
    build-once/probe-many family (operators/dedup_index.py for
    MinHash, ann_index.py for vectors): a delta image batch hashes
    ONLY ITSELF and equi-joins the stored postings, so per-ingest cost
    is O(|Δ| + candidates) at any corpus size. The band split is a
    pure function of (phash, bands), pinned in meta so probes can
    never mix band geometries."""
    import os

    from ..sinks.staged import publish

    slices = _band_slices(hash_col, bands)
    postings = sketches.select(
        F.col(id_col).alias("corpus_id"), F.explode(slices).alias("bs")
    ).select(
        "corpus_id",
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    hashes = sketches.select(
        F.col(id_col).alias("corpus_id"), F.col(hash_col).alias("phash")
    )
    meta = sketches.sparkSession.createDataFrame(
        [(int(bands),)], "bands int"
    )
    return {
        "postings": publish(postings, os.path.join(base, "postings")),
        "hashes": publish(hashes, os.path.join(base, "hashes")),
        "meta": publish(meta, os.path.join(base, "meta")),
    }


def phash_match_against_index(
    delta_sketches: DataFrame,
    base: str,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_distance: int = 7,
) -> DataFrame:
    """Near-duplicate matches (delta_id, corpus_id, hamming ≤
    max_distance) of a DELTA image batch against the INDEXED corpus:
    only the delta is hashed and band-exploded; the corpus contributes
    its stored postings and (for candidates only) its hash column.
    ``max_distance < bands`` enforced against the INDEX's pinned band
    count — the pigeonhole losslessness contract.

    CONTRACT — cross-batch pairs ONLY (round-13 pin, shared with
    :func:`dedup_index.minhash_match_against_index` and
    :func:`audiofp.afp_match_against_index`): two near-dup images in
    the SAME delta batch are invisible to the probe (neither is
    indexed yet). An admit-on-no-match ingest loop must also run
    :func:`phash_near_pairs` over the delta's own sketches (already
    computed for the probe) and union the verdicts; see
    tests/test_multimodal.py::test_phash_ingest_loop_catches_within_batch_pairs.
    """
    import os

    from ..sinks.staged import read_published
    from .linkage import _shuffle_width

    spark = delta_sketches.sparkSession
    bands = int(read_published(
        spark, os.path.join(base, "meta")).collect()[0].bands)
    if max_distance >= bands:
        raise ValueError(
            f"max_distance={max_distance} >= index bands={bands}: the "
            "banded probe is only lossless for max_distance < bands"
        )
    postings = read_published(spark, os.path.join(base, "postings"))
    hashes = read_published(spark, os.path.join(base, "hashes"))
    slices = _band_slices(hash_col, bands)
    d_keys = delta_sketches.select(
        F.col(id_col).alias("delta_id"), F.col(hash_col).alias("h_d"),
        F.explode(slices).alias("bs"),
    ).select(
        "delta_id", "h_d",
        F.col("bs.band").alias("band"), F.col("bs.slice").alias("slice"),
    )
    sp = _shuffle_width(spark)
    cand = (
        d_keys.repartition(sp, "band", "slice")
        .join(postings.repartition(sp, "band", "slice"),
              on=["band", "slice"])
        .filter(F.col("delta_id") != F.col("corpus_id"))
        .select("delta_id", "h_d", "corpus_id")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_d").bitwiseXOR(F.col("phash")))
    return (
        cand.join(hashes, "corpus_id")
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_distance)
        .select("delta_id", "corpus_id", "hamming")
    )
