"""Physical-plan audit: dump ``explain formatted`` for every registered
query and flag anti-patterns mechanically.

Checks per plan:

* ``PushedFilters`` present when the query filters a base table;
* ``ReadSchema`` pruned (fewer columns than the table) for projections;
* no ``CartesianProduct``/``BroadcastNestedLoopJoin`` except where the
  operator is intentionally a cross join / tiny-broadcast;
* no ``Window``/``Sort`` fed by an ``Exchange SinglePartition`` (the
  whole-input-through-one-reducer scale killer) unless the feeding
  subtree is bounded — a ``TakeOrderedAndProject``/``GlobalLimit``
  below the exchange, or the query is in ``EXPECTED_TINY_WINDOW`` with
  a stated row bound (aggregate-output frames the tree can't size);
(Codegen spans are not visible in AQE formatted output — staying JVM-side
is enforced by construction: no row-at-a-time Python UDFs exist outside
the deliberate Arrow-UDF module.)

Usage: ``python tools/plan_audit.py [query ...]`` — writes PLANS.md.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# Queries where a nested-loop/cartesian join is the intended plan shape:
# q_join_cross (5×25 dims), q_sim_topk (corpus × broadcast query set),
# q_sim_ivf (corpus × broadcast centroids for cell assignment),
# q_quantile_buckets / q_text_tfidf / q_mix_weights (corpus × broadcast 1-row
# scalar frame — decile cutpoints / corpus count / token total — the
# no-collect way to attach a scalar).
EXPECTED_NESTED_LOOP = {
    "q_join_cross",
    "q_sim_topk",
    "q_sim_ivf",
    "q_quantile_buckets",
    "q_text_tfidf",
    "q_mix_weights",
    "q_quality_checks",  # two 1-row aggregate frames joined into the report
    "q_join_bloom",  # probe × broadcast 1-row bloom-bitset frame (16 KiB)
    "q_mix_sample",  # per-lang rates × broadcast 1-row token-total frame
    "q_drift_psi",  # 10-row bucket counts × broadcast 1-row totals frame
    "q_drift_ks",  # distinct-price CDF × broadcast 1-row totals/max frames
    "q_ab_chi2",  # 15-row contingency cells × broadcast 1-row grand total
    "q_sim_centroid",  # corpus × broadcast #labels centroid frame (argmax scoring)
    "q_agg_countmin",  # probe keys × broadcast 1-row stream-total frame
    "q_ts_similarity",  # user profiles × broadcast bounded query-user set
    "q_graph_truss",  # per-peel 1-row median-threshold frame broadcast back
    "q_mix_temperature",  # |langs|-row shares × broadcast 1-row normalizer
    "q_assoc_rules",  # ≤300 pair rows × broadcast 1-row basket-count frame
    "q_orders_rfm",  # per-customer frame × broadcast 1-row anchor-date frame
    "q_embed_kmeans",  # corpus × broadcast ≤8-row centroid frame per Lloyd pass
    "q_embed_outliers",  # same Lloyd passes + broadcast 8-row cutoff frame
    "q_bpe_merges",  # word types × broadcast 1-row merge-rule frame per round
    "q_bpe_apply",  # same shared merge chain: 1-row rule frame per round
    "q_sim_rrf",  # corpus × broadcast 2-row query frame (the q_sim_topk shape)
    "q_embed_pca",  # 64-row direction frame × broadcast 1-row max-norm frames
    "q_win_ratio",  # orders × broadcast 1-row grand-total frame
    "q_orders_abc",  # ranked customers × broadcast 1-row revenue total
    "q_graph_modularity",  # 1-row stats × broadcast 1-row E/n frames
    "q_sample_negative",  # orders × broadcast 1-row max-partkey frame
    "q_vocab_heavyhitters",  # ≤k candidates × broadcast 1-row token total
    "q_sim_graph_search",  # ≤3-row query frame × broadcast seed stride
    "q_dedup_semantic",  # q_embed_kmeans's Lloyd passes inlined: corpus ×
    #                      broadcast ≤8-row centroid frame per pass
}

# Queries whose plan contains a Window/Sort over Exchange SinglePartition
# where the exchanged frame is BOUNDED BY CONSTRUCTION (an aggregate whose
# group-key domain is fixed and small) — the tree alone can't prove the
# bound, so each entry states it. Anything NOT listed here that funnels
# into a single-partition window is a scale bug and gets flagged.
EXPECTED_TINY_WINDOW: dict[str, str] = {
    "q_funnel_window": "share window over the <=3-row max-stage histogram",
    "q_pareto_frontier": "sweep over the per-DAY maxima frame (one row per "
    "day, fixed ~2.4k-day date domain), never raw orders",
    "q_graph_truss": "median threshold over the support-VALUE histogram "
    "(distinct counts, not edges)",
    "q_stream_late_drop": "deliberate: arrival-order watermark semantics "
    "pinned as a batch oracle; the production form is the streaming "
    "watermark (O(1) engine state), per the docstring",
}


_TREE_NODE = re.compile(r"^([ :+\-*>]*)([A-Za-z][A-Za-z0-9]*)\s+\((\d+)\)\s*$")
_DETAIL_HDR = re.compile(r"^\((\d+)\)\s+(\S+)")

# Nodes that bound the row count of everything above them.
_BOUNDING = {"TakeOrderedAndProject", "GlobalLimit", "CollectLimit", "LocalLimit"}


def _single_partition_windows(plan: str) -> bool:
    """True if the plan has a Window or top-level Sort consuming an
    Exchange SinglePartition whose subtree has no limit-type bound.

    Parses the formatted-explain tree (indentation = depth, ``Name (id)``
    per node) plus the per-node detail blocks (to see which Exchange ids
    are ``SinglePartition``)."""
    lines = plan.splitlines()
    nodes = []  # (depth, name, id) in pre-order
    for ln in lines:
        m = _TREE_NODE.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2), m.group(3)))
    single_ids = set()
    cur = None
    for ln in lines:
        dm = _DETAIL_HDR.match(ln)
        if dm:
            cur = (dm.group(1), dm.group(2))
            continue
        if cur and cur[1] == "Exchange" and ln.startswith("Arguments:"):
            if "SinglePartition" in ln:
                single_ids.add(cur[0])
            cur = None
    if not single_ids:
        return False
    for i, (depth, name, _nid) in enumerate(nodes):
        # Sort included (round-6 ADVICE): a global orderBy normally
        # compiles to Sort over a RANGE exchange, but a Sort consuming
        # Exchange SinglePartition with no bounding limit below is the
        # same one-reducer funnel as an unpartitioned window. Bounded
        # sorts compile to TakeOrderedAndProject (never matches here).
        if name not in (
            "Window", "WindowGroupLimit", "RunningWindowFunction", "Sort"
        ):
            continue
        # subtree: following nodes with greater depth
        sub = []
        for d2, n2, i2 in nodes[i + 1:]:
            if d2 <= depth:
                break
            sub.append((d2, n2, i2))
        # the exchange feeding this window is the FIRST exchange in the
        # subtree chain; bounded if a limit node sits below it
        for j, (_d2, n2, i2) in enumerate(sub):
            if n2 == "Exchange" and i2 in single_ids:
                below = {n for _, n, _ in sub[j + 1:]}
                if not (below & _BOUNDING):
                    return True
                break
            if n2 in _BOUNDING:
                break  # bounded before any exchange
            if n2 == "Exchange":
                break  # partitioned exchange feeds it — fine
    return False


def plan_of(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, plan: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan and name not in EXPECTED_NESTED_LOOP:
        flags.append("unexpected CartesianProduct")
    if "BroadcastNestedLoopJoin" in plan and name not in EXPECTED_NESTED_LOOP:
        flags.append("unexpected BroadcastNestedLoopJoin")
    if "PushedFilters: []" in plan and "Filter" in plan and "parquet" in plan:
        # only a hint: filters may legitimately be non-pushable expressions
        flags.append("scan has empty PushedFilters despite a Filter")
    if name not in EXPECTED_TINY_WINDOW and _single_partition_windows(plan):
        flags.append("Window over unbounded Exchange SinglePartition")
    return flags


def main() -> None:
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_spark("plan-audit")
    sections, flagged = [], []
    for name in names:
        try:
            plan = plan_of(spark, name)
        except Exception as exc:  # noqa: BLE001
            sections.append(f"## {name}\n\nERROR: {exc}\n")
            flagged.append((name, ["plan error"]))
            continue
        flags = audit(name, plan)
        if flags:
            flagged.append((name, flags))
        mark = " ⚠️ " + "; ".join(flags) if flags else ""
        sections.append(f"## {name}{mark}\n\n```\n{plan}\n```\n")
    header = "# PLANS — physical plan audit (sf0.001 inputs; shapes are scale-independent)\n\n"
    if flagged:
        header += "Flagged:\n" + "\n".join(
            f"- {n}: {', '.join(fl)}" for n, fl in flagged
        ) + "\n\n"
    else:
        header += "No anti-patterns flagged.\n\n"
    with open("PLANS.md", "w", encoding="utf-8") as fh:
        fh.write(header + "\n".join(sections))
    print(f"{len(names)} plans audited; {len(flagged)} flagged")
    for n, fl in flagged:
        print(f"  {n}: {', '.join(fl)}")


if __name__ == "__main__":
    main()
