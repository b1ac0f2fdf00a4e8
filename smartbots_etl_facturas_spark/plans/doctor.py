"""Plan doctor — programmatic scale audit of a physical plan.

Everything this engine does to stay fast at 100 TB is visible in the
executed plan: filters reaching scans, broadcast build sides, absent
cartesian products, no global windows. `plan_report` extracts those
signals as data; `assert_scalable` turns the worst anti-patterns into
errors, so a pipeline can GATE deployment on plan shape the same way
it gates on tests ("the plan you'd want, not the first one that
passed"). The PERF.md checklist, as a callable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanReport:
    exchanges: int = 0
    broadcasts: int = 0
    cartesian_products: int = 0
    broadcast_nested_loop_joins: int = 0
    global_windows: int = 0
    #: partial top-k pushdown nodes (rank <= k filters): a window
    #: accompanied by one prunes per-task before the partition sort —
    #: the structural evidence a low-cardinality rank<=k window won't
    #: materialize the full group (round-11, r10 verdict #4)
    window_group_limits: int = 0
    scans: list[dict] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)


def _phys_children(node) -> list:
    """children() of a JVM SparkPlan node as a Python list (py4j
    renders Scala Seq with apply/size)."""
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _plan_subqueries(node) -> list:
    """Plans hanging off this node's EXPRESSIONS (scalar/IN subqueries,
    DPP SubqueryBroadcastExec) via QueryPlan.subqueries — children()
    alone never reaches them, so a CartesianProduct or unpartitioned
    Window hidden inside a scalar subquery would otherwise escape the
    audit entirely (round-11 ADVICE: the pre-r10 string renderer DID
    see them because treeString prints innerChildren). Works on both
    logical and physical nodes; defensive empty on node types without
    the accessor."""
    try:
        sq = node.subqueries()
        return [sq.apply(i) for i in range(sq.size())]
    except Exception:
        return []


def _scan_info(node) -> dict:
    """Scan facts straight off the JVM node: output attribute names
    (the pruned read projection) and the source-reported
    PushedFilters / PartitionFilters metadata. V1 file scans carry the
    metadata map; other scan nodes (DSv2 BatchScan, in-memory) report
    what they expose and default the rest — absence of evidence is
    reported as not-pushed, the conservative reading."""
    out = node.output()
    columns = [out.apply(i).name() for i in range(out.size())]
    pushed = False
    parts = ""
    saw_metadata = False
    try:
        md = node.metadata()
        saw_metadata = True
        if md.contains("PushedFilters"):
            pf = md.apply("PushedFilters")
            pushed = pf.strip() not in ("[]", "")
        if md.contains("PartitionFilters"):
            parts = md.apply("PartitionFilters").strip().strip("[]")
    except Exception:
        pass  # scan node type without a metadata map
    if not saw_metadata:
        # DSv2 (BatchScanExec): the V1 metadata map doesn't exist, but
        # the Scan itself knows what it pushed — read it off the node
        # instead of reporting a deterministic false negative (round-11
        # ADVICE). FileScan-based scans expose pushedFilters() directly;
        # other Scan impls at least render them in description().
        try:
            scan = node.scan()
            import re as _re

            try:
                pushed = len(scan.pushedFilters()) > 0
            except Exception:
                m = _re.search(r"PushedFilters:\s*\[([^\]]*)\]",
                               scan.description())
                pushed = bool(m and m.group(1).strip())
            try:  # FileScan renders partition filters in description()
                pm = _re.search(r"PartitionFilters:\s*\[([^\]]*)\]",
                                scan.description())
                if pm:
                    parts = pm.group(1).strip()
            except Exception:
                pass
        except Exception:
            pass  # not a DSv2 scan either: keep the conservative False
    return {
        "columns": columns,
        "pushed_filters": pushed,
        "partition_filters": parts,
    }


def plan_report(df: DataFrame) -> PlanReport:
    """Structured audit of the frame's executed physical plan.

    Walks the JVM physical-plan TREE via py4j (class names +
    partitionSpec/metadata accessors) — round-10 rewrite of the
    rendered-string regex version, the same fragility fix
    data_scale_windows got in round 9: a Spark version that re-renders
    node text can no longer silently weaken the deploy gate, and
    structural facts (a window's partition spec, a scan's pushed
    filters) come from the node itself instead of line heuristics.
    Round-11: subquery plans (QueryPlan.subqueries) are pushed onto
    the same traversal — the r10 tree walk followed only children(),
    so a flagged node inside a scalar/IN subquery passed silently
    (the old string renderer saw them via innerChildren).
    Counting rules carried over exactly: ReusedExchange is NOT an
    exchange (it re-reads an existing output), WindowGroupLimit is NOT
    a window (it accompanies the WindowExec it optimizes — counting
    both would double-count), and AQE wrappers/query stages are
    descended through transparently."""
    r = PlanReport()
    stack = [df._jdf.queryExecution().executedPlan()]  # noqa: SLF001
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            # the AQE wrapper's current plan (initial before execution,
            # re-planned after); children() is empty on the wrapper
            stack.append(node.executedPlan())
            continue
        if cls.endswith("QueryStageExec"):
            # materialized AQE stage: the real subtree hangs off plan()
            stack.append(node.plan())
            continue
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            # re-reads counted at their definition: subquery reuse
            # surfaces BOTH the SubqueryExec and its Reused wrapper via
            # QueryPlan.subqueries — descending the wrapper would count
            # the shared child's exchanges/windows twice (r11 review)
            continue
        if cls == "ShuffleExchangeExec":
            r.exchanges += 1
        elif cls == "BroadcastExchangeExec":
            r.broadcasts += 1
        elif cls == "CartesianProductExec":
            r.cartesian_products += 1
        elif cls == "BroadcastNestedLoopJoinExec":
            r.broadcast_nested_loop_joins += 1
        elif cls == "WindowGroupLimitExec":
            # not a Window (it accompanies the WindowExec it optimizes)
            # but counted separately: its presence proves the rank<=k
            # partial pushdown engaged
            r.window_group_limits += 1
        elif cls in ("WindowExec", "WindowInPandasExec"):
            # an empty partition spec funnels every row through one
            # task (the take_while guard, at plan level)
            if node.partitionSpec().size() == 0:
                r.global_windows += 1
        elif cls.endswith("ScanExec"):
            r.scans.append(_scan_info(node))
        stack.extend(_phys_children(node))
        # plans inside expressions (scalar/IN subqueries, DPP) are not
        # children() — audit them too or a flagged node hides there
        stack.extend(_plan_subqueries(node))
    if r.cartesian_products:
        r.warnings.append(
            f"{r.cartesian_products} CartesianProduct node(s): O(n*m) pair "
            "materialization — acceptable only for declared ground-truth tiers"
        )
    if r.broadcast_nested_loop_joins:
        r.warnings.append(
            f"{r.broadcast_nested_loop_joins} BroadcastNestedLoopJoin node(s): "
            "non-equi join scanning every broadcast row per input row — "
            "consider bucketed_range_join / interval bounds"
        )
    if r.global_windows:
        r.warnings.append(
            f"{r.global_windows} unpartitioned Window(s): the whole input "
            "sorts in ONE task — add partition keys"
        )
    for s in r.scans:
        if len(s["columns"]) > 12:
            r.warnings.append(
                f"scan reads {len(s['columns'])} columns — likely missing "
                "projection pruning"
            )
    return r


def assert_scalable(df: DataFrame, allow_nested_loop: bool = False) -> PlanReport:
    """Raise when the plan contains a scale-killer (cartesian product,
    unpartitioned window, or — unless allowed — a nested-loop join);
    returns the report otherwise. The deploy gate."""
    r = plan_report(df)
    fatal = []
    if r.cartesian_products:
        fatal.append("CartesianProduct")
    if r.global_windows:
        fatal.append("unpartitioned Window")
    if r.broadcast_nested_loop_joins and not allow_nested_loop:
        fatal.append("BroadcastNestedLoopJoin")
    if fatal:
        raise RuntimeError(
            "plan contains scale anti-patterns: " + ", ".join(fatal)
            + "; report=" + repr(r.warnings)
        )
    return r


def data_scale_windows(df: DataFrame) -> int:
    """Count Window nodes whose input is DATA-scale: some leaf
    relation is reachable beneath the Window without crossing an
    Aggregate.

    Why it matters: ``Window.partitionBy(key)`` puts each key group's
    EVERY row on one task. That is fine when the key is
    high-cardinality (user sessions, per-query ANN ranks) and a
    single-task sort of the corpus when the key cardinality is far
    below the parallelism (~6 returnflag|linestatus groups over a
    100 TB fact) — the hot-group cliff. Cardinality is invisible in a
    plan, so this is NOT a universal gate; it exists for the
    order-statistics family (group_quantile_values and friends) whose
    CONTRACT is "windows only ever run on an aggregated
    (key × distinct-value) frame" — their regression tests pin this
    count to zero, so a refactor that quietly reintroduces a
    fact-scale rank fails even while the value oracle stays green.

    The aggregate-between-scan-and-window shape this checks is
    necessary but not sufficient: a continuous value domain makes the
    "reduced" frame data-scale again one level down. That half is
    enforced at RUNTIME by the operators themselves
    (orderstats.MAX_DOMAIN_PER_KEY raise_error guard riding the
    window pass) — plan inspection cannot see cardinality.

    Walks the OPTIMIZED logical plan as a JVM TREE via py4j
    (``nodeName`` / ``children``) — round-9 rewrite of the round-8
    string-indentation heuristic, which would silently mis-count on
    multi-line expression renderings or renamed nodes (r8 ADVICE #5).
    Node-kind checks are still by name, but structure comes from the
    tree itself, and an unrecognized LEAF (``children`` empty, name
    not in the known-safe set) is conservatively treated as a data
    relation so new scan node types FAIL the gate instead of slipping
    by.
    """
    plan = df._jdf.queryExecution().optimizedPlan()  # noqa: SLF001

    def children(node):
        ch = node.children()
        # scala Seq -> list via py4j
        return [ch.apply(i) for i in range(ch.size())]

    # leaves that are NOT data-scale relations (bounded by
    # construction): empty relations and 1-row aggregate results never
    # make a window data-scale.
    safe_leaves = {"OneRowRelation", "LocalLimit", "EmptyRelation"}

    def has_unaggregated_leaf(node) -> bool:
        name = node.nodeName()
        if name == "Aggregate":
            return False
        ch = children(node)
        if not ch:
            # LocalRelation carries literal rows (bounded seed frames)
            # — still a relation: count it unless provably tiny is
            # impossible to know here, so treat every non-safe leaf as
            # data-scale (conservative).
            return name not in safe_leaves
        return any(has_unaggregated_leaf(c) for c in ch)

    count = 0
    stack = [plan]
    while stack:
        node = stack.pop()
        ch = children(node)
        if node.nodeName() == "Window" and any(
            has_unaggregated_leaf(c) for c in ch
        ):
            count += 1
        stack.extend(ch)
        # subquery expressions carry whole plans children() never
        # reaches — a fact-scale Window inside a scalar subquery must
        # count too (round-11, same fix as plan_report)
        stack.extend(_plan_subqueries(node))
    return count
