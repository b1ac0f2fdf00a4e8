"""Audio fingerprint near-duplicate detection — the AUDIO member of
the engine's near-dup dedup triad (text: operators/dedup.py, image:
operators/phash.py; round-12): Haitsma-Kalker-style sub-fingerprints
(ISMIR 2002, "A highly robust audio fingerprinting system") computed
in EXACT INTEGER arithmetic over decoded PCM16, matched by an exact
(frame, word) equi-join — never all-pairs.

The classic scheme derives one 32-bit word per frame from the SIGN of
the difference-of-differences of band energies (time delta of the
band-adjacent energy delta). This implementation keeps that exact
shape but measures band energy in the TIME domain (sum of squared
samples over ``bands + 1`` contiguous sub-segments per frame) instead
of an FFT filter bank — every energy is an exact int64, so:

- bit-reproducibility is total (no float anywhere);
- the fingerprint is EXACTLY invariant under positive integer
  amplitude scaling (energies scale by c² > 0; sign of every
  difference is preserved) — the robustness property the paper gets
  approximately, here provable;
- locality is provable: samples of frame f contribute only to words
  f and f+1, so corrupting one frame window changes AT MOST TWO of
  the ``frames - 1`` words — the provable near-dup bound the
  registered invariant query pins.

Matching: two recordings are near-duplicates when at least
``min_matches`` of their frame words agree EXACTLY at the same frame
index. Candidates come from a (frame_idx, word) self-equi-join — the
word is a 32-bit value, so random collisions are negligible and the
join is banded by construction (the word IS the bucket key); the
per-pair match count is one keyed aggregation.

Scale shape: the fingerprint table is ``frames - 1`` longs per
recording; no stage touches samples after the fingerprint pass; the
candidate join is keyed and width-pinned like every candidate
generator in the repo (PPJoin / edit-distance / pHash discipline).

Reference parity note: the reference engine has no audio operators —
this module extends the engine's LLM-training-data surface
(SURVEY §2.10), reusing the multimodal WAV codec
(sources/multimodal.py:wav_decode).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "afp_index_geometry",
    "afp_match_against_index",
    "afp_near_pairs",
    "audio_fingerprint_words",
    "audio_fingerprints",
    "build_afp_index",
]


def audio_fingerprint_words(samples, frames: int = 32,
                            bands: int = 33) -> list[int]:
    """``frames - 1`` exact-integer 32-bit fingerprint words for one
    mono int-array recording. The trailing remainder of samples that
    does not fill a full (frame × sub-segment) grid is ignored, so
    recordings a few samples apart in length still compare."""
    import numpy as np

    x = np.asarray(samples, dtype=np.int64).reshape(-1)
    seg = len(x) // (frames * bands)
    if seg < 1:
        raise ValueError(
            f"recording too short: {len(x)} samples < frames*bands "
            f"= {frames * bands}"
        )
    used = x[: frames * bands * seg]
    # E[f, b] = sum of squared samples of sub-segment b of frame f
    e = (used * used).reshape(frames, bands, seg).sum(axis=2)
    band_delta = e[:, :-1] - e[:, 1:]          # (frames, bands-1)
    dd = band_delta[1:] - band_delta[:-1]      # (frames-1, bands-1)
    bits = (dd > 0).astype(np.int64)
    weights = (1 << np.arange(bits.shape[1], dtype=np.int64))
    return [int(w) for w in (bits * weights).sum(axis=1)]


def _to_mono(arr):
    """(n, channels) int16 → mono int64 by exact integer channel sum
    (sum, not mean: scaling by the channel count preserves every
    energy-difference sign, so the fingerprint is identical)."""
    import numpy as np

    return np.asarray(arr, dtype=np.int64).sum(axis=1)


def audio_fingerprints(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    frames: int = 32,
    bands: int = 33,
) -> DataFrame:
    """(id, frame_idx, word) fingerprint rows per recording —
    Arrow-batched mapInPandas over the WAV binary payload column:
    decode PCM16, exact mono fold, integer fingerprint words. Only the
    id and payload columns are read; output is ``frames - 1`` longs
    per recording."""
    import pandas as pd

    from ..sources.multimodal import wav_decode

    src = df.select(F.col(id_col), F.col(content_col).alias("__content"))

    def _batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            ids, fidx, words = [], [], []
            for mid, payload in zip(pdf[id_col], pdf["__content"]):
                arr, _sr = wav_decode(bytes(payload))
                ws = audio_fingerprint_words(_to_mono(arr), frames, bands)
                ids.extend([mid] * len(ws))
                fidx.extend(range(len(ws)))
                words.extend(ws)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(fidx, dtype="int64"),
                 "word": pd.Series(words, dtype="int64")}
            )

    return src.mapInPandas(
        _batches, schema=f"{id_col} long, frame_idx long, word long"
    )


def afp_near_pairs(
    fps: DataFrame,
    id_col: str = "media_id",
    min_matches: int = 29,
) -> DataFrame:
    """Near-duplicate recording pairs (id_a, id_b, n_matched) whose
    fingerprints agree on at least ``min_matches`` frame words —
    candidates from the exact (frame_idx, word) self-equi-join, match
    count per pair from one keyed aggregation, deduplicated with
    id_a < id_b. With the default 32-frame/32-bit geometry,
    min_matches = 29 admits the provable one-corrupted-frame bound
    (≤ 2 words differ) with one word of slack."""
    from .linkage import _shuffle_width

    sp = _shuffle_width(fps.sparkSession)
    left = fps.select(
        F.col(id_col).alias("id_a"), "frame_idx", "word"
    ).repartition(sp, "frame_idx", "word")
    right = fps.select(
        F.col(id_col).alias("id_b"), "frame_idx", "word"
    ).repartition(sp, "frame_idx", "word")
    return (
        left.join(right, on=["frame_idx", "word"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matched"))
        .filter(F.col("n_matched") >= int(min_matches))
    )


# --- persisted audio-fingerprint index (incremental audio ingest) ------------


def build_afp_index(
    fps: DataFrame,
    base: str,
    id_col: str = "media_id",
    frames: int = 32,
    bands: int = 33,
) -> dict[str, str]:
    """Persist the corpus's fingerprint postings (corpus_id,
    frame_idx, word) plus a 1-row geometry meta table through the
    versioned sink — the audio member of the build-once/probe-many
    family (text: dedup_index.py, image: phash.build_phash_index,
    vectors: ann_index.py): a delta recording batch fingerprints ONLY
    ITSELF and equi-joins the stored postings, so per-ingest cost is
    O(|Δ| + candidates) at any corpus size. The word grid is a pure
    function of (samples, frames, bands), pinned in meta so probes
    can never mix geometries."""
    import os

    from ..sinks.staged import publish

    postings = fps.select(
        F.col(id_col).alias("corpus_id"), "frame_idx", "word"
    )
    meta = fps.sparkSession.createDataFrame(
        [(int(frames), int(bands))], "frames int, bands int"
    )
    return {
        "postings": publish(postings, os.path.join(base, "postings")),
        "meta": publish(meta, os.path.join(base, "meta")),
    }


def afp_index_geometry(spark, base: str) -> tuple[int, int]:
    """(frames, bands) the index was built with — callers fingerprint
    delta batches with EXACTLY this grid."""
    import os

    from ..sinks.staged import read_published

    r = read_published(spark, os.path.join(base, "meta")).collect()[0]
    return int(r.frames), int(r.bands)


def afp_match_against_index(
    delta_fps: DataFrame,
    base: str,
    id_col: str = "media_id",
    min_matches: int = 29,
) -> DataFrame:
    """Near-duplicate matches (delta_id, corpus_id, n_matched ≥
    min_matches) of a DELTA recording batch against the INDEXED
    corpus: only the delta is fingerprinted; the corpus contributes
    its stored postings. Same keyed (frame_idx, word) join + one
    aggregation as the self-join tier, width-pinned.

    CONTRACT — cross-batch pairs ONLY (round-13 pin, shared with
    :func:`dedup_index.minhash_match_against_index` and
    :func:`phash.phash_match_against_index`): two near-dup recordings
    in the SAME delta batch are invisible to the probe (neither is
    indexed yet). An admit-on-no-match ingest loop must also run
    :func:`afp_near_pairs` over the delta's own fingerprints (already
    computed for the probe) and union the verdicts; see
    tests/test_multimodal.py::test_afp_ingest_loop_catches_within_batch_pairs.
    """
    import os

    from ..sinks.staged import read_published
    from .linkage import _shuffle_width

    spark = delta_fps.sparkSession
    postings = read_published(spark, os.path.join(base, "postings"))
    sp = _shuffle_width(spark)
    d = delta_fps.select(
        F.col(id_col).alias("delta_id"), "frame_idx", "word"
    ).repartition(sp, "frame_idx", "word")
    return (
        d.join(postings.repartition(sp, "frame_idx", "word"),
               on=["frame_idx", "word"])
        .filter(F.col("delta_id") != F.col("corpus_id"))
        .groupBy("delta_id", "corpus_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_matched"))
        .filter(F.col("n_matched") >= int(min_matches))
    )
