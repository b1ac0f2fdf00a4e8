"""Persisted MinHash-LSH dedup index — incremental near-dup matching
of a DELTA batch against an already-indexed corpus, the
build-once/probe-many twin of operators/ann_index.py for the dedup
family.

A real 100 TB ingest pipeline does not re-sketch the corpus per
batch: the corpus's banded LSH postings are built ONCE (one row per
(doc, band) — bands·|corpus| longs, tiny next to the text) and
published through the versioned sink; each incoming delta batch
sketches ONLY ITSELF, equi-joins its (band, bucket) keys against the
stored postings, and exact-verifies the candidates. Per-batch cost is
O(|delta| + candidates), independent of corpus size outside the
postings join.

The bucket keys are a pure function of (text, num_hashes, bands,
shingle_n) — fixed hash-seed permutations (xxhash64 or portable md5, pinned in the meta table), no RNG state — so
delta sketches computed in a later process match the stored postings
exactly (operators/dedup.py:lsh_band_buckets). The index is
self-describing: a 1-row meta table pins the sketch parameters, and
the probe reads them instead of trusting the caller to repeat them.

Verification joins candidate doc ids back to the TEXT of both sides
(shingling only candidate docs), so the output has no false
positives — same exactness contract as minhash_lsh_pairs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.staged import publish, read_published
from .dedup import doc_shingles, lsh_band_buckets


def build_minhash_index(
    corpus: DataFrame,
    base: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> dict[str, str]:
    """Persist the corpus's banded LSH postings (corpus_id, band,
    bucket) plus a 1-row parameter meta table; returns published
    version ids. ``hash_fn`` (xxhash64 production / md5 portable —
    see operators/dedup.py:minhash_signatures) is pinned in the meta
    table so probes can never mix permutation families."""
    spark = corpus.sparkSession
    postings = lsh_band_buckets(
        corpus, text_col, id_col, num_hashes, bands, shingle_n, hash_fn
    ).select(F.col(id_col).alias("corpus_id"), "band", "bucket")
    meta = spark.createDataFrame(
        [(num_hashes, bands, shingle_n, hash_fn)],
        "num_hashes int, bands int, shingle_n int, hash_fn string",
    )
    return {
        "postings": publish(postings, os.path.join(base, "postings")),
        "meta": publish(meta, os.path.join(base, "meta")),
    }


def _index_params(spark: SparkSession, base: str) -> tuple[int, int, int, str]:
    r = read_published(spark, os.path.join(base, "meta")).collect()[0]
    # hash_fn landed in round 10; indexes published before then are
    # xxhash64 by construction
    hash_fn = getattr(r, "hash_fn", None) or "xxhash64"
    return int(r.num_hashes), int(r.bands), int(r.shingle_n), hash_fn


def minhash_match_against_index(
    delta: DataFrame,
    corpus: DataFrame,
    base: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.1,
) -> DataFrame:
    """Near-dup pairs (delta_id, corpus_id, jaccard) between the delta
    batch and the INDEXED corpus, exact-Jaccard verified. Only the
    delta is sketched; the corpus contributes its stored postings and
    (for candidates only) its text.

    CONTRACT — cross-batch pairs ONLY (round-13 pin, shared by the
    whole incremental probe family: :func:`phash_match_against_index`,
    :func:`audiofp.afp_match_against_index`): two near-dup documents
    arriving in the SAME delta batch are not reported here, because
    neither is in the index yet. An ingest loop that admits documents
    on "no probe match" must ALSO run the batch-local banded pass over
    the delta — ``minhash_lsh_pairs(delta, ...)`` with the index's
    pinned parameters — and union its verdicts, or it admits both
    copies forever. The delta's sketches are recomputed there, but the
    batch is small by construction; see
    tests/test_incremental.py::test_ingest_loop_composes_probe_with_batch_local_pass.
    """
    spark = delta.sparkSession
    num_hashes, bands, shingle_n, hash_fn = _index_params(spark, base)
    postings = read_published(spark, os.path.join(base, "postings"))

    d_b = lsh_band_buckets(
        delta, text_col, id_col, num_hashes, bands, shingle_n, hash_fn
    ).select(F.col(id_col).alias("delta_id"), "band", "bucket")
    cand = (
        d_b.join(postings, on=["band", "bucket"])
        .filter(F.col("delta_id") != F.col("corpus_id"))
        .select("delta_id", "corpus_id")
        .distinct()
    )

    # exact verification over CANDIDATE docs only: semi-join each side
    # down to its candidate ids before shingling, so verify cost
    # follows the candidate volume, not the corpus
    d_docs = delta.join(
        cand.select(F.col("delta_id").alias(id_col)).distinct(),
        id_col, "left_semi",
    )
    c_docs = corpus.join(
        cand.select(F.col("corpus_id").alias(id_col)).distinct(),
        id_col, "left_semi",
    )
    sh_d = doc_shingles(d_docs, text_col, id_col, shingle_n).select(
        F.col(id_col).alias("delta_id"), "shingle"
    )
    sh_c = doc_shingles(c_docs, text_col, id_col, shingle_n).select(
        F.col(id_col).alias("corpus_id"), "shingle"
    )
    sz_d = sh_d.groupBy("delta_id").agg(F.count(F.lit(1)).alias("size_d"))
    sz_c = sh_c.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("size_c"))
    inter = (
        cand.join(sh_d, "delta_id")
        .join(sh_c, ["corpus_id", "shingle"])
        .groupBy("delta_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jaccard = F.col("n_common").cast("double") / (
        F.col("size_d") + F.col("size_c") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(sz_d, "delta_id")
        .join(sz_c, "corpus_id")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("delta_id", "corpus_id", "jaccard")
    )

def build_embedding_index(
    corpus: DataFrame,
    base: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_bits: int = 8,
    dim: int = 64,
    tables: int = 16,
) -> dict[str, str]:
    """Persist the corpus's hyperplane-bucket postings — the embedding
    member of the persisted dedup-index family (MinHash for text,
    pHash for images, Haitsma-Kalker for audio, frame-pHash for
    video): (corpus_id, table, bucket) postings, the verify-side
    vectors+norms, and a 1-row geometry meta table, all through the
    versioned sink.

    The planes are a pure function of (bucket_bits, dim, tables) —
    xxhash64(j, i) parity, no RNG state (operators/similarity.py:
    _plane_matrix) — so a delta batch sketched in a LATER process
    collides with the stored postings exactly; the meta table pins the
    geometry so probes can never mix plane families. Storing the
    corpus vectors beside the postings means probes never touch the
    raw corpus table — and never RE-SKETCH it: per-batch compute is
    O(|delta| + candidates), with the verify reading the stored
    vectors through a column-pruned scan streamed against the
    broadcast candidate set (the same shape as the minhash probe's
    candidate-text semi-join).
    """
    spark = corpus.sparkSession
    from .dedup import hyperplane_keyed
    from .similarity import with_norm as _with_norm

    postings = hyperplane_keyed(
        corpus, vec_col, id_col, bucket_bits, dim, tables,
        out_id="corpus_id",
    )
    vectors = _with_norm(corpus, vec_col).select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).alias("vec"),
        F.col("__norm").alias("norm"),
    )
    meta = spark.createDataFrame(
        [(bucket_bits, dim, tables)],
        "bucket_bits int, dim int, tables int",
    )
    return {
        "postings": publish(postings, os.path.join(base, "postings")),
        "vectors": publish(vectors, os.path.join(base, "vectors")),
        "meta": publish(meta, os.path.join(base, "meta")),
    }


def embedding_match_against_index(
    delta: DataFrame,
    base: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs (delta_id, corpus_id, cosine >= threshold)
    between a delta batch and the INDEXED embedding corpus — the
    incremental member of the semantic-dedup family. Only the delta is
    sketched (with the geometry pinned in the index's meta table);
    candidates come from the (table, bucket) equi-join against the
    stored postings, and the exact-cosine verify runs against the
    STORED vectors — the probe never reads the raw corpus table and
    never re-sketches anything but the delta (the verify's stored-
    vector scan is column-pruned and keyed on candidate ids). Exactness
    contract: no false positives (every emitted pair is exact-cosine
    verified); recall is the hyperplane collision probability
    1-(1-(1-theta/pi)^bits)^tables, floor-checked by the registered
    semantic_dedup_incremental_recall companion.

    CONTRACT — cross-batch pairs ONLY (the round-13 pin shared by the
    whole incremental probe family: minhash_match_against_index,
    phash_match_against_index, afp_match_against_index,
    vfp_match_against_index): two near-dup vectors arriving in the
    SAME delta batch are not reported, because neither is in the index
    yet. An ingest loop admitting on "no probe match" must ALSO run
    the batch-local pass — ``cosine_neardup_pairs(delta,
    bucket_bits=..., tables=...)`` with the meta table's geometry —
    and union its verdicts, or it admits both copies forever; see
    tests/test_incremental.py.
    """
    spark = delta.sparkSession
    from .dedup import hyperplane_keyed
    from .linkage import _shuffle_width
    from .similarity import _dot, with_norm as _with_norm

    r = read_published(spark, os.path.join(base, "meta")).collect()[0]
    postings = read_published(spark, os.path.join(base, "postings"))
    vectors = read_published(spark, os.path.join(base, "vectors"))

    d_k = hyperplane_keyed(
        delta, vec_col, id_col, int(r.bucket_bits), int(r.dim),
        int(r.tables), out_id="delta_id",
    )
    # width pin (the banded-join discipline): the sketch frames are
    # tiny in bytes but the equi-join emits the candidate volume
    sp = _shuffle_width(spark)
    cand = (
        d_k.repartition(sp, "table", "bucket")
        .join(postings.repartition(sp, "table", "bucket"),
              on=["table", "bucket"])
        .filter(F.col("delta_id") != F.col("corpus_id"))
        .select("delta_id", "corpus_id")
        .distinct()
    )
    d_v = _with_norm(delta, vec_col).select(
        F.col(id_col).alias("delta_id"),
        F.col(vec_col).alias("__vd"),
        F.col("__norm").alias("__nd"),
    )
    return (
        cand.join(d_v, "delta_id")
        .join(vectors, "corpus_id")
        .withColumn(
            "cosine",
            _dot(F.col("__vd"), F.col("vec")) / (F.col("__nd") * F.col("norm")),
        )
        .filter(F.col("cosine") >= threshold)
        .select("delta_id", "corpus_id", "cosine")
    )
