"""Iterative graph dataflow: PageRank over an edge list.

The canonical "iterative algorithm as repeated joins" workload —
per iteration: out-degree-normalized contributions flow along edges
(one equi-join on the source key), sum per destination (one keyed
aggregation), damping applied. No driver-side graph state; the plan
is the same two shuffles per iteration at any graph size, which is
exactly how Pregel-style engines schedule it.

Cross-engine determinism: ranks are kept as INTEGER nano-units
(1 rank = 1e9 nanos) and every step is int64 arithmetic — division
by out-degree is integer division, damping 0.85 is (17 · s) div 20 —
so the rank vector is bit-identical across engines and partitionings
with NO float rounding anywhere (round(double, n) is not guaranteed
to agree between engines near ties; integer div is). Truncation
instead of round-to-nearest loses < 1 nano per operation, far below
any ranking-relevant scale, and lets an unrolled-CTE SQL oracle
value-check the FULL rank vector.

Scale note: iterations compound lineage; beyond ~10 rounds pass
``checkpoint_every`` (localCheckpoint, same policy as
operators/dedup.py's label propagation) to keep plans bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NANO = 1_000_000_000


class GraphNotConverged(RuntimeError):
    """A bounded fixpoint loop exhausted its round budget before
    converging. Raised instead of silently returning a partially
    propagated labeling (which could emit a node as both member and
    root, i.e. conflicting component labels)."""


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    checkpoint_every: int | None = None,
) -> DataFrame:
    """Rank nodes of the directed graph ``edges`` (one row per edge;
    parallel edges should be pre-deduplicated). Damping is fixed at
    0.85 = 17/20 so the update stays exact int64 arithmetic.

    Dangling nodes (no out-edges) contribute nothing — with a
    symmetric edge list (add reversed edges for undirected semantics)
    none exist. Returns (node, rank_nanos) with
    sum(rank_nanos) ≈ N · 1e9 (minus sub-nano truncation).
    """
    # round-14: edges is joined on `src` TWICE per iteration (ranks +
    # outdeg lookups) and nodes/outdeg are re-referenced every
    # iteration — materialize each once, edges partitioned+sorted by
    # the join key so iterations exchange only the rank frame, never
    # the edge list (guide §2.4 — the bfs_levels/sssp standing-frame
    # policy). All arithmetic is exact int64, so partitioning cannot
    # change a single rank.
    e = (
        edges.select(src, dst)
        .repartition(F.col(src))
        .sortWithinPartitions(src)
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # e is already hash(src)-partitioned, so this agg is exchange-free
    outdeg = (
        e.groupBy(F.col(src).alias("node"))
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank_nanos", F.lit(NANO).cast("long"))
    for i in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", src), src)
            .join(outdeg.withColumnRenamed("node", src), src)
            .select(
                F.col(dst).alias("node"),
                F.expr("rank_nanos div outdeg").alias("c"),
            )
        )
        sums = contrib.groupBy("node").agg(F.sum("c").cast("long").alias("s"))
        ranks = (
            nodes.join(sums, "node", "left")
            .select(
                "node",
                (
                    F.lit(NANO * 15 // 100).cast("long")
                    + F.expr("(17 * coalesce(s, 0L)) div 20")
                ).alias("rank_nanos"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_count(
    edges: DataFrame, a: str = "a", b: str = "b", checkpoint: bool = True
) -> DataFrame:
    """Exact triangle count of the UNDIRECTED graph ``edges`` via
    degree-ordered edge orientation (the classic MapReduce scheme of
    Suri & Vassilvitskii 2011, "Counting Triangles and the Curse of
    the Last Reducer"): orient every edge from its lower-(degree,
    node) endpoint to the higher one, join oriented edges u→v with
    v→w to enumerate wedges, and keep wedges whose closing edge u→w
    is oriented too. Each triangle is counted EXACTLY once (its
    degree-minimal vertex is the only wedge center that survives
    orientation), and because every oriented out-neighborhood has
    size O(sqrt(m)), the wedge join materializes O(m^1.5) rows
    instead of the O(Σ deg²) of naive wedge enumeration — this is
    what kills the "curse of the last reducer" on skewed 100 TB
    graphs where a hub vertex would otherwise own deg² wedges.

    Input rows are undirected edges in any orientation; duplicates
    and self-loops are removed here. Plan: one dedup shuffle + one
    degree agg + three equi-joins — no cartesian anywhere.
    Returns a 1-row frame (n_triangles,)."""
    und = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient from lower (deg, node) to higher — a total order, so the
    # oriented graph is acyclic and out-degrees are O(sqrt(m))-bounded
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
    )
    if checkpoint:
        # oriented is consumed THREE times (both wedge sides + the
        # closing-edge probe); without materialization each reference
        # re-executes the whole dedup+degree+orientation lineage —
        # measured 32 exchanges vs 7 with the checkpoint (same policy
        # as pagerank/label propagation: localCheckpoint to cut
        # repeated upstream work, not to persist)
        oriented = oriented.localCheckpoint(eager=True)
    wedges = (
        oriented.select(F.col("s").alias("x"), F.col("t").alias("y"))
        .join(
            oriented.select(F.col("s").alias("y"), F.col("t").alias("z")),
            "y",
        )
        .select("x", "y", "z")
    )
    closed = wedges.join(
        oriented.select(F.col("s").alias("x"), F.col("t").alias("z")),
        ["x", "z"],
    )
    return closed.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))


def k_core(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    a: str = "a",
    b: str = "b",
    checkpoint_every: int = 1,
    strict: bool = True,
) -> DataFrame:
    """The k-core of the UNDIRECTED graph ``edges`` by ``rounds`` of
    synchronous peeling (Seidman 1983; the Pregel-style formulation):
    each round drops every node whose CURRENT degree is below k and
    every edge touching a dropped node. With enough rounds this is
    the maximal subgraph of minimum degree ≥ k; a FIXED round count
    keeps the operator deterministic and lets an unrolled-CTE oracle
    value-check it — callers needing guaranteed convergence run until
    the edge count stops changing (each round strictly shrinks the
    graph or is the fixpoint, so rounds ≈ graph diameter suffice in
    practice; tests pin fixpoint behavior).

    Per round: one degree aggregation + two semi-joins — all keyed,
    no cartesian; lineage is cut every ``checkpoint_every`` rounds.
    Unlike pagerank (whose per-round plan is 2 shuffles), a k_core
    round is 3 shuffle stages wide, so re-deriving un-checkpointed
    rounds for the next round's lineage costs more than the
    materialization: every-round checkpointing measured 5.1 s -> 3.3 s
    at sf0.1 vs the old every-3 cadence. Returns (node, deg) of the
    surviving subgraph."""
    cur = (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    for i in range(rounds):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .select("u", "v")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)
    cur = cur.localCheckpoint(eager=True)
    out = (
        cur.select(F.col("u").alias("node"))
        .unionAll(cur.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    if strict:
        # Fixpoint iff every surviving node keeps degree >= k in the
        # surviving subgraph — one bounded probe over checkpointed
        # edges, the connected_components convergence-probe policy.
        # strict=False restores the raw hop-bounded contract for
        # unrolled-CTE oracles that pin a fixed round count.
        if out.filter(F.col("deg") < k).limit(1).count() > 0:
            raise GraphNotConverged(
                f"k_core: peeling did not reach fixpoint within "
                f"rounds={rounds} (a surviving node still has degree "
                f"< {k}). Raise rounds, or pass strict=False for the "
                f"hop-bounded contract."
            )
    return out


def sssp(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "s",
    dst: str = "t",
    weight: str = "w",
    node: str = "node",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Weighted single-source(-set) shortest paths by ``rounds`` of
    synchronous Bellman-Ford relaxation — the weighted generalization
    of :func:`bfs_levels`. Per round: the current distance frontier
    joins the edge list on the source key (one equi-join), proposes
    ``dist + w`` to each neighbor, and a keyed min-aggregation folds
    proposals into the running distances. After ``rounds`` rounds the
    result is the exact minimum distance over all paths of at most
    ``rounds`` edges — a deterministic, hop-bounded contract (like
    ``bfs_levels``' ``max_depth``) that a depth-bounded recursive CTE
    can value-check on any engine. Callers needing full convergence
    run ``rounds >= |V| - 1`` or iterate to fixpoint.

    Weights must be non-negative integers so every distance is exact
    int64 arithmetic — no float accumulation order to disagree on.
    ``edges`` is directed (pass both orientations for undirected
    graphs). Returns ``(node, dist)`` for every node reached within
    the hop bound; seeds are at distance 0.

    Scale: two keyed shuffles per round (join + min-agg), frontier
    never leaves the cluster, lineage cut every ``checkpoint_every``
    rounds — the Pregel SSSP schedule.
    """
    e = edges.select(
        F.col(src).alias("__s"),
        F.col(dst).alias("__t"),
        F.col(weight).cast("long").alias("__w"),
    )
    if checkpoint_every:
        # round-14: e is joined on __s by EVERY relaxation round, but
        # it was never materialized — each round re-derived the whole
        # edge subtree (self-join + distinct in the benched caller)
        # AND re-exchanged it, while only the small distance frame
        # changes. Materialize once, partitioned+sorted by the join
        # key, so rounds exchange the frontier only (guide §2.4 — the
        # bfs_levels standing-frame policy).
        e = (
            e.repartition(F.col("__s"))
            .sortWithinPartitions("__s")
            .localCheckpoint(eager=True)
        )
    dist = (
        seeds.select(F.col(node).alias("n"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for r in range(rounds):
        relax = dist.join(e, dist.n == e.__s).select(
            F.col("__t").alias("n"),
            (F.col("dist") + F.col("__w")).alias("dist"),
        )
        dist = (
            dist.unionByName(relax)
            .groupBy("n")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint_every and (r + 1) % checkpoint_every == 0:
            dist = dist.localCheckpoint(eager=True)
    return dist.select(F.col("n").alias(node), F.col("dist"))


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    a: str = "a",
    b: str = "b",
    node: str = "node",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Multi-source breadth-first search over the UNDIRECTED graph
    ``edges``: minimum hop distance (0..max_depth) from any seed node,
    nodes beyond max_depth omitted. The level-synchronous Pregel
    formulation: frontier ⋈ edges → neighbors, anti-join against
    visited, repeat — per level one equi-join + one anti-join, both
    keyed on the node; no per-node driver state, frontier size is the
    only growth.

    Deterministic (min distance is partition-order-free), so a
    depth-bounded recursive CTE value-checks it on any engine.
    Returns (node, dist)."""
    sym = edges.select(F.col(a).alias("s"), F.col(b).alias("t")).unionAll(
        edges.select(F.col(b).alias("s"), F.col(a).alias("t"))
    ).filter(F.col("s") != F.col("t")).distinct()
    if checkpoint_every:
        # sym joins EVERY level's frontier — materialize once instead
        # of re-deriving the dedup per level (the triangle_count
        # lesson: multiply-referenced frames re-execute their lineage).
        # Round-14: materialize it PARTITIONED AND SORTED BY THE JOIN
        # KEY — the distinct leaves sym hash(s,t)-partitioned, which
        # no level's frontier⋈sym join can reuse, so every level was
        # re-exchanging and re-sorting the whole edge list (the big
        # frame at scale) while only the KB-scale frontier changes.
        # localCheckpoint preserves outputPartitioning/ordering, so
        # each level now exchanges the frontier only (guide §2.4).
        sym = (
            sym.repartition(F.col("s"))
            .sortWithinPartitions("s")
            .localCheckpoint(eager=True)
        )
    visited = seeds.select(F.col(node).alias("n")).distinct().withColumn(
        "dist", F.lit(0)
    )
    frontier = visited.select("n")
    for depth in range(1, max_depth + 1):
        neighbors = (
            frontier.join(sym, frontier.n == sym.s)
            .select(F.col("t").alias("n"))
            .distinct()
        )
        fresh = neighbors.join(visited.select("n"), "n", "left_anti")
        visited = visited.unionByName(
            fresh.withColumn("dist", F.lit(depth))
        )
        frontier = fresh.select("n")
        if checkpoint_every and depth % checkpoint_every == 0:
            visited = visited.localCheckpoint(eager=True)
            frontier = frontier.localCheckpoint(eager=True)
    return visited.select(
        F.col("n").alias(node), F.col("dist").cast("long").alias("dist")
    )


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 32,
) -> DataFrame:
    """Connected components of the UNDIRECTED graph ``edges`` by
    min-label propagation to FIXPOINT: every node starts labeled with
    itself; each round takes the min of its own and its neighbors'
    labels (one equi-join + one keyed min-agg); converged when no
    label changed — at most diameter rounds, ``max_rounds`` is a
    runaway bound. The per-round convergence probe is a bounded
    driver read (``limit(1).count()`` — the operators/dedup.py
    label-propagation policy); since that probe forces each round's
    plan anyway, every round is checkpoint-materialized first, which
    both cuts lineage and avoids computing the round twice.

    Component ids are the component's MINIMUM node id — a canonical,
    partition-order-free labeling any engine reproduces, so a
    reachability oracle (recursive CTE, min reachable label) can
    value-check every (node, component) row.

    Returns ``(node, component)``. For the billion-edge regime the
    literature's large-star/small-star alternation cuts round count;
    min-label keeps the per-round plan to the same two keyed shuffles
    as pagerank and is exact at any size.
    """
    sym = (
        edges.select(F.col(a).alias("s"), F.col(b).alias("t"))
        .unionAll(edges.select(F.col(b).alias("s"), F.col(a).alias("t")))
        .filter(F.col("s") != F.col("t"))
        .distinct()
        # round-14: the per-round join is on "t" (labels arrive keyed
        # by node = t); materializing sym already partitioned+sorted
        # by t means every propagation round exchanges only the label
        # frame, never the edge list (guide §2.4 — the bfs_levels /
        # sssp standing-frame policy)
        .repartition(F.col("t"))
        .sortWithinPartitions("t")
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for i in range(max_rounds):
        nbr = (
            sym.join(labels.withColumnRenamed("node", "t")
                     .withColumnRenamed("label", "nbr_label"), "t")
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("nbr_label").alias("nbr_label"))
        )
        new = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("__changed"),
            )
        )
        # the convergence probe forces this round's plan anyway, so
        # materialize it FIRST — otherwise every un-checkpointed round
        # is computed twice (once for the probe, once as next-round
        # lineage) and lineage still compounds (measured 4.6 s -> 2.9 s
        # at sf0.1)
        new = new.localCheckpoint(eager=True)
        changed = new.filter(F.col("__changed")).limit(1).count()
        labels = new.drop("__changed")
        if changed == 0:
            break
    else:
        raise GraphNotConverged(
            f"connected_components: no fixpoint within max_rounds="
            f"{max_rounds}; labels would be partially propagated. "
            f"Raise max_rounds (>= graph diameter)."
        )
    return labels.select("node", F.col("label").alias("component"))


def _canon(e: DataFrame) -> DataFrame:
    """Canonical larger->smaller orientation, self-loops dropped."""
    return (
        e.select(
            F.greatest(F.col("u"), F.col("v")).alias("u"),
            F.least(F.col("u"), F.col("v")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 16,
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al. 2014, "Connected Components in MapReduce
    and Beyond") — the O(log² n)-round scale tier next to
    :func:`connected_components`' min-label propagation (which needs
    O(diameter) rounds and suffers on path-shaped graphs).

    Per round: large-star connects every strictly-larger neighbor of
    u to m = min(N(u) ∪ {u}); small-star does the same for the
    smaller-or-equal neighbors on larger-to-smaller-oriented edges.
    Each phase is one keyed min-aggregation + one equi-join — the
    pagerank shuffle budget — and provably halves component heights
    until every component is a star rooted at its minimum node.
    Convergence is checked with bounded driver probes
    (``exceptAll().limit(1).count()``, the dedup.py policy).

    Returns ``(node, component)``, component = min node id —
    IDENTICAL labeling to connected_components, pinned by tests on
    both random and adversarial path graphs.
    """
    cur = _canon(
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        # large-star
        sym = cur.select("u", "v").unionAll(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(F.min("v").alias("__mn"))
        m = F.least(F.col("__mn"), F.col("u"))
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
        )
        # small-star on larger->smaller orientation
        ori = large.select(
            F.greatest(F.col("u"), F.col("v")).alias("s"),
            F.least(F.col("u"), F.col("v")).alias("t"),
        ).filter(F.col("s") != F.col("t"))
        smins = ori.groupBy("s").agg(F.min("t").alias("__m"))
        small = (
            ori.join(smins, "s")
            .select(F.col("t").alias("u"), F.col("__m").alias("v"))
            .unionAll(
                smins.select(F.col("s").alias("u"), F.col("__m").alias("v"))
            )
        )
        nxt = _canon(small).localCheckpoint(eager=True)
        # one symmetric-difference probe instead of two exceptAll
        # probes: same fixpoint condition (nxt == cur as multisets)
        # in a single bounded job — measured 4.1 s -> 3.4 s at sf0.1
        # (two driver round-trips per round collapsed to one).
        diff = (
            nxt.exceptAll(cur)
            .unionAll(cur.exceptAll(nxt))
            .limit(1)
            .count()
        )
        cur = nxt
        if diff == 0:
            break
    else:
        raise GraphNotConverged(
            f"connected_components_star: no star fixpoint within "
            f"max_rounds={max_rounds}; a node could be emitted as both "
            f"member and root. Raise max_rounds (O(log^2 n) suffices)."
        )
    # at the star fixpoint every edge is (member, root); roots label
    # themselves
    members = cur.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    )
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots)
