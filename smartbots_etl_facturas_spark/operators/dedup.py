"""Deduplication operators for the large-scale training-data pipeline
(BASELINE.json north star — beyond the reference surface).

Four tiers, all expressed as DataFrame dataflows that scale
horizontally (no driver-side state, no cross-pair quadratic blowup
except inside LSH buckets):

- exact_dedup:        hash-groupBy on a content digest (S8/U1-adjacent)
- ngram_jaccard_pairs: exact set-similarity via shingle inverted index
  (explode → self-join on shingle → per-pair intersection counts)
- minhash_lsh_pairs:  MinHash signatures + banded LSH bucketing; only
  same-bucket candidates are verified → near-linear at 100 TB
- simhash:            64-bit per-doc sketch; near-dups share sketch
  (or low Hamming distance) — cheapest, coarsest tier

MinHash/SimHash use xxhash64 (engine-specific bit patterns), so their
driver checks are rows-only; the Jaccard VERIFICATION of LSH
candidates is exact and is cross-checked in tests against
ngram_jaccard_pairs on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smartbots_etl_facturas_spark.functions.text import shingles_from_tokens, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one surviving id per distinct content digest.

    GroupBy on md5(text) — the shuffle key is the 32-char digest, not
    the document body, so the exchange stays narrow at scale."""
    return (
        df.withColumn("doc_hash", F.md5(F.encode(F.col(text_col), "UTF-8")))
        .groupBy("doc_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def doc_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    with_tokens = df.select(id_col, tokens(F.col(text_col)).alias("__tokens"))
    return (
        with_tokens.select(id_col, F.explode(shingles_from_tokens("__tokens", n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    Inverted-index join: explode shingles, self-join on the shingle,
    count per-pair intersections, then |A∪B| = |A|+|B|−|A∩B|. Pairs
    sharing nothing never materialize. Hot shingles (stopword runs)
    dominate the join at scale — pair with minhash_lsh_pairs there.

    Deliberately NOT ``.cache()``-d: the result is lazy, so there is no
    safe point inside this function to ``unpersist`` — a cache here
    leaks executor memory across repeated calls in a long session.
    The shingle subtree is referenced three times in one plan; with AQE
    on, Catalyst's ReuseExchange dedupes the identical shuffle, and the
    explode itself is cheap narrow work.
    """
    sh = doc_shingles(df, text_col, id_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jac = (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "n_common", "size_a", "size_b", "jaccard"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, seed, minhash) — num_hashes independent permutations
    simulated by hashing each shingle together with the seed literal.

    ``hash_fn``: ``"xxhash64"`` (default — the fast JVM hash, the
    production tier; minhash is a LONG) or ``"md5"`` (portable tier:
    ``md5(seed || ':' || shingle)`` hex digest, min taken
    LEXICOGRAPHICALLY over the fixed-width lowercase hex — identical
    in any engine with md5, so the whole LSH pipeline downstream is
    DuckDB value-oracle-checkable; minhash is a STRING). Same
    min-permutation estimator either way — only the permutation
    family changes.

    The seeds frame is tiny and broadcast; min-aggregation is
    map-side-combinable, so the shuffle carries one row per (doc, seed).
    """
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    sh = doc_shingles(df, text_col, id_col, shingle_n)
    seeds = df.sparkSession.range(num_hashes).select(F.col("id").alias("seed"))
    h = (
        F.xxhash64(F.col("shingle"), F.col("seed"))
        if hash_fn == "xxhash64"
        else F.md5(F.concat_ws(":", F.col("seed").cast("string"),
                               F.col("shingle")))
    )
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(id_col, "seed", h.alias("h"))
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, band, bucket): the banded LSH bucket keys — a pure
    function of (text, num_hashes, bands, shingle_n, hash_fn) since
    the permutations are fixed hash seeds, so two frames sketched
    with the same parameters land equal documents in equal buckets
    even across runs/processes. Shared by the in-query pair join
    (:func:`minhash_lsh_pairs`) and the persisted incremental index
    (operators/dedup_index.py). On the ``"md5"`` tier the bucket is
    the md5 hex of the sorted (seed:minhash) list — engine-portable
    end to end; on ``"xxhash64"`` it is the xxhash64 long (narrower
    shuffle keys, the production tier)."""
    assert num_hashes % bands == 0
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n,
                             hash_fn)
    band_list = F.concat_ws(
        ",", F.sort_array(F.collect_list(F.concat_ws(":", "seed", "minhash")))
    )
    bucket = (F.xxhash64(band_list) if hash_fn == "xxhash64"
              else F.md5(band_list))
    return (
        sig.withColumn("band", (F.col("seed") % bands).cast("int"))
        .groupBy(id_col, "band")
        .agg(bucket.alias("bucket"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.1,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """MinHash + banded LSH near-dup pairs with exact verification.

    rows = bands × rows_per_band; a pair lands in the same bucket when
    one full band of minhashes agrees (P ≈ 1-(1-j^r)^b). Candidates are
    then verified with the EXACT Jaccard over shingles, so the output
    has no false positives — LSH only bounds recall. ``hash_fn="md5"``
    runs the engine-portable permutation family (see
    :func:`minhash_signatures`): same estimator, value-oracle-checkable
    candidate set; ``"xxhash64"`` stays the production default.
    """
    banded = lsh_band_buckets(df, text_col, id_col, num_hashes, bands,
                              shingle_n, hash_fn)
    ca = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    cb = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    candidates = (
        ca.join(cb, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # Exact-Jaccard verification restricted to CANDIDATE pairs only —
    # cost O(|candidates| · doc_size), independent of how many
    # non-candidate pairs share a shingle. (Scoring every co-shingle
    # pair via the full inverted index would defeat the LSH bucketing
    # at scale.)
    sh = doc_shingles(df, text_col, id_col, shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    sh_a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        candidates.join(sh_a, on="id_a")
        .join(sh_b, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jaccard = F.col("n_common").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("n_common")
    ).cast("double")
    return (
        inter.join(sz_a, on="id_a")
        .join(sz_b, on="id_b")
        .withColumn("jaccard", jaccard)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def apply_span_cuts(
    docs: DataFrame,
    runs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """REDACT the cut-list ranges from each document — the final step
    of the span-dedup pipeline (detect: ``duplicate_spans``; merge:
    ``duplicate_span_runs``; remove: this). ``runs`` carries
    ``(id_col, start_pos, end_pos)`` token ranges (0-based,
    end-exclusive, as duplicate_span_runs emits); every token whose
    position falls inside ANY of its document's ranges is dropped and
    the survivors re-join with single spaces — output text is
    therefore WHITESPACE-NORMALIZED (the tokenizer's view, which is
    what every downstream span/token operator consumes anyway).

    Output: (id, clean text, n_tokens_removed, n_tokens_kept).

    Scale shape: ranges aggregate to one array per document (bounded
    by that document's cut count), one keyed LEFT join ships them to
    the docs, and the removal itself is a pure Column expression —
    positional filter + exists over the range array inside codegen,
    no shuffle beyond the join, documents without cuts pass through
    unchanged (modulo the whitespace normalization).

    NULL ``text_col`` raises at execution naming the document (the
    streaming folds' fail-fast discipline): silently it would yield
    an empty clean_text with NULL token counts — garbage that only
    surfaces rounds later. Filter or default NULL text upstream.
    """
    cuts = runs.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("start_pos").alias("s"),
                     F.col("end_pos").alias("e"))
        ).alias("__cuts")
    )
    toks = F.when(
        F.col(text_col).isNull(),
        F.raise_error(F.concat(
            F.lit(
                f"apply_span_cuts: NULL {text_col!r} for {id_col}="
            ),
            F.col(id_col).cast("string"),
            F.lit(" — text must be non-null (drop or default upstream)"),
        )),
    ).otherwise(tokens(F.col(text_col)))
    base = (
        docs.join(cuts, id_col, "left")
        .withColumn("__cuts", F.coalesce(
            F.col("__cuts"),
            F.expr("CAST(array() AS array<struct<s: long, e: long>>)"),
        ))
        .withColumn("__toks", toks)
    )
    kept = F.filter(
        F.col("__toks"),
        lambda t, i: ~F.exists(
            F.col("__cuts"),
            lambda c: (i >= c["s"]) & (i < c["e"]),
        ),
    )
    return base.select(
        id_col,
        F.concat_ws(" ", kept).alias("clean_text"),
        (F.size("__toks") - F.size(kept)).cast("long").alias(
            "n_tokens_removed"
        ),
        F.size(kept).cast("long").alias("n_tokens_kept"),
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash sketch per document.

    Classic Charikar sketch: hash each token, each bit position votes
    +1/−1 by that bit of the hash, sketch bit = sign of the vote sum.
    Implemented as one explode + one groupBy with 64 conditional sums —
    a single shuffle, map-side combinable.

    ``hash_fn``: ``"xxhash64"`` (default — the fast JVM hash, the
    production tier) or ``"md5"`` (two 32-bit slices of the hex
    digest via the house conv idiom — bit-identical across engines,
    so the sketch itself is DuckDB value-oracle-checkable)."""
    tok = df.select(id_col, F.explode(tokens(F.col(text_col))).alias("tok"))
    if hash_fn == "xxhash64":
        hashed = tok.select(id_col, F.xxhash64("tok").alias("h"))
        bit_of = [
            F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) for i in range(bits)
        ]
    elif hash_fn == "md5":
        if bits != 64:
            raise ValueError("md5 tier is fixed at 64 bits (two hex8 slices)")
        d = F.md5("tok")
        hashed = tok.select(
            id_col,
            F.conv(F.substring(d, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(d, 9, 8), 16, 10).cast("long").alias("h2"),
        )
        bit_of = [
            F.shiftright(F.col("h1" if i < 32 else "h2"), i % 32)
            .bitwiseAND(F.lit(1))
            for i in range(bits)
        ]
    else:
        raise ValueError("hash_fn must be 'xxhash64' or 'md5'")
    votes = [
        F.sum(F.when(bit_of[i] == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = hashed.groupBy(id_col).agg(*votes)
    sketch = None
    for i in range(bits):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        sketch = term if sketch is None else sketch.bitwiseOR(term)
    return agg.select(id_col, sketch.alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two 64-bit sketch columns."""
    return F.bit_count(a.bitwiseXOR(b))


def neardup_clusters(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
    checkpoint: str = "local",
    publish_base: str | None = None,
) -> DataFrame:
    """Connected components over the near-dup pair graph → one
    ``cluster_id`` (the component's minimum id) per node. The step a
    real dedup pipeline needs between "pairs found" and "keep one per
    group": A~B and B~C must collapse to ONE cluster even though A~C
    was never scored.

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converged when no
    label changes. Each round is one join + one groupBy (shuffles on
    the node id, AQE-coalesced); the frame is localCheckpoint-ed per
    round so lineage stays flat (the same bounded-iteration pattern as
    kmeans_centroids — a deliberately non-SQL-expressible dataflow,
    oracle-checked against DuckDB's recursive CTE on the same graph).
    Rounds needed = graph diameter; near-dup components are shallow
    (dup groups, not social graphs), so ``max_iters`` is a backstop,
    not a tuning knob. Singleton nodes keep their own id.

    ``checkpoint`` selects the per-round plan-truncation strategy:

    - ``"local"`` (default): ``localCheckpoint`` — right for the
      tens-of-millions-of-nodes range; blocks live on executors, so
      executor loss forfeits the round chain.
    - ``"publish"``: write each round's working state through the
      versioned sink under ``{publish_base}/labels_work`` and RE-READ
      it — the 100 TB shape: spill-safe, survives executor loss, each
      round restartable from the last published version, round
      history inspectable (one version dir per round, pointer always
      at the newest). The CONVERGED result is additionally published
      once, clean (node, label only — no per-round bookkeeping
      columns), to ``{publish_base}/labels``.

    ``pairs`` needs columns id_a/id_b; ``nodes`` needs ``id_col``.
    """
    if checkpoint not in ("local", "publish"):
        raise ValueError(f"checkpoint must be 'local' or 'publish', got {checkpoint!r}")
    if checkpoint == "publish" and not publish_base:
        raise ValueError("checkpoint='publish' requires publish_base")

    if checkpoint == "publish":
        from smartbots_etl_facturas_spark.sinks.staged import publish, read_published

        def _truncate(df: DataFrame, tag: str) -> DataFrame:
            base = f"{publish_base}/{tag}"
            publish(df, base)
            return read_published(df.sparkSession, base)
    else:
        def _truncate(df: DataFrame, tag: str) -> DataFrame:
            return df.localCheckpoint()

    edges = _truncate(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct(),
        "edges",
    )
    labels = _truncate(
        nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label")),
        "labels_work",
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = _truncate(
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))).alias(
                    "label"
                ),
                (F.col("nbr_label") < F.col("label")).alias("__changed"),
            ),
            "labels_work",
        )
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break
    else:
        # exhausting max_iters without a fixpoint means the labels are
        # WRONG (one component still carries several cluster ids) —
        # fail loudly rather than let duplicates silently survive the
        # keep-one-per-cluster step downstream
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iters} rounds; "
            "the pair graph has a component with diameter > max_iters "
            "— raise max_iters"
        )
    out = labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_id"))
    if checkpoint == "publish":
        # the consumable artifact: converged labels, clean schema
        out = _truncate(out, "labels")
    return out


def cluster_representatives(
    clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep-one-per-cluster selection: (cluster_id, keep_id, n_members)
    — the final dedup decision over :func:`neardup_clusters` output."""
    return clusters.groupBy("cluster_id").agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_members")
    )


def hyperplane_keyed(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_bits: int = 8,
    dim: int = 64,
    tables: int = 1,
    out_id: str | None = None,
) -> DataFrame:
    """(id, table, bucket) hyperplane sign sketches — one row per
    (vector, table), the candidate key both :func:`cosine_neardup_pairs`
    and the persisted embedding index (operators/dedup_index.py:
    build_embedding_index) join on. A pure function of the vector and
    the (bucket_bits, dim, tables) geometry — the planes are
    xxhash64(j, i) parity, no RNG state — so sketches computed in a
    LATER process collide with stored postings bit-identically, the
    property the incremental probe relies on. Tiering follows
    cosine_topk_lsh: expression fold below the matmul crossover, one
    Arrow-batched matmul past it."""
    from smartbots_etl_facturas_spark.operators.similarity import (
        _plane_matrix,
        _resolve_assign_mode,
        hyperplane_bucket_expr,
        hyperplane_buckets_matmul,
    )

    out = out_id or id_col
    mode = _resolve_assign_mode("auto", tables * bucket_bits, dim)
    if mode == "matmul":
        planes = _plane_matrix(df.sparkSession, bucket_bits, dim, tables)
        return hyperplane_buckets_matmul(
            df.select(F.col(id_col), F.col(vec_col)), planes,
            bucket_bits, tables, vec_col, id_col, out_id=out,
        )
    buckets = F.array(*[
        hyperplane_bucket_expr(vec_col, bucket_bits, dim, table=t)
        for t in range(tables)
    ])
    return df.select(
        F.col(id_col).alias(out),
        F.posexplode(buckets).alias("table", "bucket"),
    )


def cosine_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    bucket_bits: int | None = None,
    dim: int = 64,
    tables: int = 1,
    return_candidates: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) — the fifth dedup tier, over vector columns.

    With ``bucket_bits=None`` every pair is scored (exact ground
    truth; O(n²) — fine for verification corpora). With ``bucket_bits``
    set, candidates are restricted to vectors sharing a
    random-hyperplane sign bucket in at least one of ``tables``
    independent plane families, so the self-join is (table, bucket)
    equi-partitioned (narrow shuffle) instead of a cross join — the
    scale path: near-dups (cosine ≥ 0.9 ⇒ small angle) collide with
    probability 1-(1-(1-θ/π)^bits)^tables. All ``tables`` sketches
    are computed in ONE pass over the corpus (posexplode of a bucket
    array), candidates are distinct'd as bare id pairs, and only the
    surviving pairs re-join their vectors for the exact verify — the
    SemDeDup candidate shape (round-13 verdict #1).

    ``return_candidates=True`` returns the DISTINCT candidate id pairs
    BEFORE the exact-cosine verify — the frozen-fixture hook
    (fixtures/ann_candidates.py discipline) that lets the verify
    arithmetic be value-oracled even though the sign-dependent
    candidate generation is not SQL-replayable.

    Sketching follows the cosine_topk_lsh tiering: the expression fold
    for small tables·bits·dim, ONE Arrow-batched matmul against the
    (tables·bits × d) plane matrix past the crossover (the registered
    16-table × 8-bit × 64-dim point is 8192 terms — 32× past it; the
    expression tier measured ~24 s vs ~3.4 s matmul steady-state at
    sf0.1, recall 1.00 in both). Exact
    verify stays JVM-side (zip_with/aggregate fold in double).
    """
    from smartbots_etl_facturas_spark.operators.similarity import (
        _dot,
        with_norm,
    )

    base = with_norm(df, vec_col)
    if bucket_bits:
        keyed = hyperplane_keyed(df, vec_col, id_col, bucket_bits, dim,
                                 tables)
        # width pin (the banded-join discipline, operators/phash.py):
        # the sketch frames are tiny in bytes but the (table, bucket)
        # equi-join emits the candidate volume — explicit repartition
        # by the join key is exempt from AQE byte-based coalescing
        from .linkage import _shuffle_width

        sp = _shuffle_width(df.sparkSession)
        cand = (
            keyed.select(F.col(id_col).alias("id_a"), "table", "bucket")
            .repartition(sp, "table", "bucket")
            .join(
                keyed.select(F.col(id_col).alias("id_b"), "table", "bucket")
                .repartition(sp, "table", "bucket"),
                on=["table", "bucket"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        if return_candidates:
            return cand
        joined = cand.join(
            base.select(F.col(id_col).alias("id_a"),
                        F.col(vec_col).alias("__va"),
                        F.col("__norm").alias("__na")),
            "id_a",
        ).join(
            base.select(F.col(id_col).alias("id_b"),
                        F.col(vec_col).alias("__vb"),
                        F.col("__norm").alias("__nb")),
            "id_b",
        )
    else:
        if return_candidates:
            raise ValueError(
                "return_candidates requires bucket_bits: the exact tier "
                "has no candidate stage to freeze"
            )
        a = base.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            F.col("__norm").alias("__na"),
        )
        b = base.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            F.col("__norm").alias("__nb"),
        )
        # parallelize the all-pairs path: one-split sources would
        # otherwise score every pair in a single task (see PERF.md)
        par = df.sparkSession.sparkContext.defaultParallelism
        joined = a.repartition(par).crossJoin(b).filter(
            F.col("id_a") < F.col("id_b")
        )
    return (
        joined.withColumn(
            "cosine", _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_occurrences: int = 1,
    sep: str = "\n",
) -> DataFrame:
    """Cross-document LINE deduplication — the CCNet preprocessing
    step (Wenzek et al. 2020 §3.1 drop duplicated paragraphs before
    LM filtering): boilerplate lines (headers, nav bars, cookie
    banners) repeat across millions of pages and survive
    document-level dedup, so they are removed line-wise when their
    corpus-wide occurrence count exceeds ``max_occurrences``.

    Output: (id_col, clean_text, n_kept, n_dropped) with surviving
    lines rejoined in original order (empty string when nothing
    survives).

    Scale shape: posexplode → count on the line's md5 DIGEST (narrow
    32-char shuffle key, map-side combine collapses hot boilerplate
    before the shuffle — the hot key never straggles) → equi-join
    lines to counts on digest → per-document ordered reassembly via
    array_sort(collect_list(struct(pos, line))). No driver-side data,
    no all-pairs anything.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).withColumn("__d", F.md5(F.encode(F.col("line"), "UTF-8")))
    counts = lines.groupBy("__d").agg(F.count(F.lit(1)).alias("__n"))
    joined = lines.join(counts, "__d")
    keep = F.col("__n") <= max_occurrences
    assembled = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.when(keep, F.struct("pos", "line")))
        ).alias("__kept"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(keep, 0).otherwise(1)).cast("long").alias("n_dropped"),
    )
    return assembled.select(
        id_col,
        F.array_join(
            F.transform(F.col("__kept"), lambda s: s["line"]), sep
        ).alias("clean_text"),
        "n_kept",
        "n_dropped",
    )


def span_digests(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
) -> DataFrame:
    """One row per ``window``-token span (stride 1): (id, start_pos,
    span_hash) with span_hash = md5 of the space-joined tokens — the
    shared raw material of the span-dedup family (detection, cut-list
    merging, and the persisted incremental index). Pure Column
    expression, engine-portable digests."""
    toks = tokens(F.col(text_col))
    spans = F.expr(
        f"CASE WHEN size(__toks) >= {window} THEN "
        f"transform(sequence(1, size(__toks) - {window - 1}), "
        f"i -> struct(i - 1 AS start_pos, "
        f"md5(concat_ws(' ', slice(__toks, i, {window}))) AS span_hash)) "
        f"ELSE array() END"
    )
    return (
        docs.select(F.col(id_col), toks.alias("__toks"))
        .select(id_col, F.explode(spans).alias("__s"))
        .select(
            id_col,
            F.col("__s.start_pos").alias("start_pos"),
            F.col("__s.span_hash").alias("span_hash"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_occurrences: int = 2,
    exploded: bool = False,
    max_examples: int = 5,
) -> DataFrame:
    """Exact-substring (span-level) duplicate detection — the third
    granularity of the dedup family (document-level: exact_dedup /
    minhash; line-level: line_dedup; span-level: this), after Lee et
    al. 2021 ("Deduplicating Training Data Makes Language Models
    Better"): verbatim token runs repeated across the corpus are
    memorization hazards even when documents and lines are unique.

    Every ``window``-token span (stride 1) is hashed (md5 of the
    space-joined tokens). DEFAULT output is ONE row per duplicated
    digest: (span_hash, n_occurrences, n_docs, min_doc_id,
    example_doc_ids) where example_doc_ids is the ``max_examples``
    smallest distinct doc ids comma-joined — output size is bounded
    by the number of DISTINCT hot spans, so a corpus-wide hot span
    (the exact case this exists for) costs one row, not one row per
    occurrence. ``exploded=True`` keeps the per-occurrence debug form
    (id, start_pos, span_hash, n_occurrences) with start_pos 0-based
    — location detail for the cut/redact pass, at one output row per
    duplicated occurrence.

    Scale shape: span generation is a pure Column expression
    (transform over positions + slice + concat_ws — no Python); the
    occurrence count shuffles on the 32-char digest with map-side
    combine. The compact default is one digest-keyed aggregation —
    output ~flat as replicas scale; the exploded variant adds one
    equi-join on the digest and scales with duplicated-span volume.
    """
    exploded_df = span_digests(docs, text_col, id_col, window)
    if exploded:
        counts = exploded_df.groupBy("span_hash").agg(
            F.count(F.lit(1)).alias("n_occurrences")
        )
        return (
            exploded_df.join(counts, "span_hash")
            .filter(F.col("n_occurrences") >= min_occurrences)
            .select(id_col, "start_pos", "span_hash", "n_occurrences")
        )
    # compact default: one digest-keyed aggregation, one output row per
    # duplicated digest; example ids are the max_examples SMALLEST
    # distinct doc ids (sort before cast — deterministic and numeric)
    return (
        exploded_df.groupBy("span_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_set(F.col(id_col))),
                            1, max_examples),
                    lambda x: x.cast("string"),
                ),
            ).alias("example_doc_ids"),
        )
        .filter(F.col("n_occurrences") >= min_occurrences)
    )


def duplicate_span_runs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """MAXIMAL duplicated token ranges per document — the CUT LIST of
    the Lee et al. 2021 removal pass that ``duplicate_spans`` stops
    short of: consecutive duplicated span start positions merge into
    one run, so a 500-token verbatim quote is one (doc, start, end)
    row to excise, not 493 overlapping window hits.

    A token position p is DUPLICATED when the ``window``-token span
    starting at p occurs >= ``min_occurrences`` times corpus-wide
    (exactly duplicate_spans' exploded form). Runs are maximal
    stretches of consecutive duplicated positions; the emitted range
    covers tokens ``[start_pos, end_pos)`` (0-based,
    ``end_pos = last duplicated start + window``), i.e. every token
    that participates in any duplicated span of the run. ``n_spans``
    is the number of merged window hits.

    Scale shape: span hashing + occurrence counting as in
    duplicate_spans (one digest-keyed map-side-combinable count + one
    equi-join); the island merge is a lag/cumsum window PARTITIONED
    BY DOCUMENT over only the duplicated positions — high-cardinality
    key, frame bounded by duplicated-span volume, never the corpus.
    Fully deterministic (md5 digests), so the whole cut list is
    value-oracle-checkable cross-engine.
    """
    hot = duplicate_spans(
        docs, text_col, id_col, window, min_occurrences, exploded=True
    )
    return merge_hot_positions(hot, id_col, window)


def merge_hot_positions(
    hot: DataFrame, id_col: str, window: int
) -> DataFrame:
    """Island-merge a (id, start_pos) frame of duplicated span start
    positions into maximal (id, start_pos, end_pos, n_spans) runs —
    the lag/cumsum window runs per document over ONLY the duplicated
    positions (shared by the batch cut list and the incremental
    index probe)."""
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("start_pos")
    run = (
        hot.withColumn("__prev", F.lag("start_pos").over(w))
        .withColumn(
            "__new",
            (
                F.col("__prev").isNull()
                | (F.col("start_pos") - F.col("__prev") > 1)
            ).cast("int"),
        )
        .withColumn(
            "__run",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return (
        run.groupBy(id_col, "__run")
        .agg(
            F.min("start_pos").cast("long").alias("start_pos"),
            (F.max("start_pos") + window).cast("long").alias("end_pos"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
        )
        .select(id_col, "start_pos", "end_pos", "n_spans")
    )
