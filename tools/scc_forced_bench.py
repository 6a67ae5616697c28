"""Measure q_graph_scc's DISTRIBUTED FW-BW path at scale (round-11,
VERDICT r10 item 7): the committed sf1/sf3 SCC medians all ran the
size-gated single-task Tarjan kernel (transition-graph edge counts sit
far under _SCC_LOCAL_EDGE_CAP), so the 100 TB path — the trim +
doubling forward-backward loop — had no recorded at-scale number.

For each corpus this tool measures BOTH dispatches (warmup +
median-of-ROUNDS, cold-cache eviction before every run — the
sf1_bench methodology) plus the edge count that drives the dispatch,
and annotates the SF artifact's q_graph_scc entry with which path the
default run takes and what the forced-distributed run costs.

Usage: python tools/scc_forced_bench.py [--sf1] [--sf3]
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from tools.sf1_bench import ROUNDS, _evict_cold  # noqa: E402
from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.operators import graph as G  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402


def _median_scc(spark, sf_dir: str, forced: bool) -> float:
    fn = QUERIES["q_graph_scc"].fn
    old = G._SCC_FORCE_DISTRIBUTED
    G._SCC_FORCE_DISTRIBUTED = forced
    try:
        _evict_cold("q_graph_scc", sf_dir)
        fn(spark, sf_dir).collect()  # warmup
        ts = []
        for _ in range(ROUNDS):
            _evict_cold("q_graph_scc", sf_dir)
            t0 = time.monotonic()
            fn(spark, sf_dir).collect()
            ts.append(time.monotonic() - t0)
    finally:
        G._SCC_FORCE_DISTRIBUTED = old
    return round(statistics.median(ts), 3)


def main() -> None:
    spark = get_spark("scc-forced-bench")
    targets = []
    if "--sf1" in sys.argv:
        targets.append(("SF1_BENCH.json", "_scale/sf1", "sf1"))
    if "--sf3" in sys.argv:
        targets.append(("SF3_BENCH.json", "_scale/sf3", "sf3"))
    for art_path, sf_dir, label in targets:
        n_edges = G._scc_edges(spark, sf_dir).count()
        kernel_s = _median_scc(spark, sf_dir, forced=False)
        forced_s = _median_scc(spark, sf_dir, forced=True)
        st = dict(G._SCC_LAST_STATS)
        art = json.load(open(art_path))
        entry = art["queries"].setdefault("q_graph_scc", {})
        entry[f"{label}_sec"] = kernel_s
        entry[f"{label}_transition_edges"] = n_edges
        entry[f"{label}_default_path"] = (
            "local_tarjan_kernel"
            if n_edges <= G._SCC_LOCAL_EDGE_CAP
            else "distributed_fwbw"
        )
        entry[f"{label}_forced_distributed_sec"] = forced_s
        entry[f"{label}_forced_distributed_rounds"] = {
            k: st[k]
            for k in ("trim_batches", "fwd_rounds", "bwd_rounds", "outer_passes")
            if k in st
        }
        entry["note_paths"] = (
            "default dispatch is the size-gated single-task Tarjan kernel "
            f"below _SCC_LOCAL_EDGE_CAP={G._SCC_LOCAL_EDGE_CAP} transition "
            "edges; forced_distributed_sec measures the trim + doubling "
            "FW-BW loop (the 100 TB path) on the same corpus "
            "(tools/scc_forced_bench.py, warmup + median-of-"
            f"{ROUNDS} with cold-cache eviction)"
        )
        json.dump(art, open(art_path, "w"), indent=2)
        print(
            json.dumps(
                {
                    "artifact": art_path,
                    "edges": n_edges,
                    "kernel_sec": kernel_s,
                    "forced_distributed_sec": forced_s,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
