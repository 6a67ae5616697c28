"""Re-measure the graph-ANN build/search split (after the round-9
adaptive-seed-stride fix) and the q_graph_scc scaling point, then patch
the committed SF artifacts in place.

Why a patch instead of a third full sf1_bench run: the HEAVY-query
medians in SF1_BENCH.json/SF3_BENCH.json are unaffected by the stride
change (it touches only graph_beam_search's entry set) — re-running the
whole suite would burn ~80 min to refresh numbers that didn't change.
Every value written here is measured by the same methodology as
sf1_bench (warmup + median-of-{ROUNDS} for query paths, single measured
materialization for builds); the artifact records the provenance.

Usage: python tools/patch_sf_split.py [--sf3]
"""

from __future__ import annotations

import json
import math
import statistics
import sys
import time

sys.path.insert(0, ".")

from tools.sf1_bench import ROUNDS, _evict_cold, _graph_ann_split  # noqa: E402
from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"


def _median_time(spark, sf_dir: str, name: str) -> float:
    # _evict_cold: queries whose RESULT is _cached_frame-served must be
    # evicted before every run, or post-warmup rounds time the persisted
    # read-back instead of the build (round-9 ADVICE — the committed
    # 22.3s/40.6s scc numbers were pre-cache and the tool as then merged
    # no longer reproduced them).
    fn = QUERIES[name].fn
    _evict_cold(name, sf_dir)
    fn(spark, sf_dir).collect()  # warmup
    ts = []
    for _ in range(ROUNDS):
        _evict_cold(name, sf_dir)
        t0 = time.monotonic()
        fn(spark, sf_dir).collect()
        ts.append(time.monotonic() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    with_sf3 = "--sf3" in sys.argv
    spark = get_spark("patch-sf-split")

    # Retunes whose SF entries must be re-measured (the stored medians
    # describe code that no longer exists). Round 11: q_embed_knn_ann's
    # broadcast-gather scoring + windowed top-k + convergence exit.
    retuned = ["q_dedup_near", "q_embed_knn_ann"]

    split01 = _graph_ann_split(spark, SF01)
    scc01 = _median_time(spark, SF01, "q_graph_scc")
    re01 = {n: _median_time(spark, SF01, n) for n in retuned}
    spark.catalog.clearCache()
    split1 = _graph_ann_split(spark, "_scale/sf1")
    scc1 = _median_time(spark, "_scale/sf1", "q_graph_scc")
    re1 = {n: _median_time(spark, "_scale/sf1", n) for n in retuned}

    sf1 = json.load(open("SF1_BENCH.json"))
    sf1["graph_ann_split"] = {"sf0.1": split01, "sf1": split1}
    sf1.setdefault("notes", []).append(
        "graph_ann_split + q_graph_scc re-measured post adaptive-seed-stride"
        " (tools/patch_sf_split.py); HEAVY medians from the full run"
    )
    ratio = round(scc1 / scc01, 2) if scc01 else None
    sf1["sf0.1"]["q_graph_scc"] = scc01
    sf1["sf1"]["q_graph_scc"] = scc1
    sf1["queries"]["q_graph_scc"] = {
        "sf0.1_sec": scc01,
        "sf1_sec": scc1,
        "observed_ratio": ratio,
        "predicted_exponent": 1.0,
        "note": "size-gated single-task Tarjan kernel at these scales "
        "(edges < 2M); the distributed FW-BW path is round-count-pinned "
        "in tests/test_graph_ts.py",
    }
    for n in retuned:
        sf1["sf0.1"][n] = re01[n]
        sf1["sf1"][n] = re1[n]
        rr = round(re1[n] / re01[n], 2) if re01[n] else None
        entry = sf1["queries"].setdefault(n, {})
        entry.update(
            {
                "sf0.1_sec": re01[n],
                "sf1_sec": re1[n],
                "observed_ratio": rr,
                "note": "re-measured after the round-10 retune "
                "(hub-subsampled ANN candidates / digest-collapsed "
                "near-dup)",
            }
        )
        entry.setdefault("predicted_exponent", 1.0)
    _exponent_pass(sf1, 10.0)
    json.dump(sf1, open("SF1_BENCH.json", "w"), indent=2)
    print(json.dumps({"sf1_split": split1, "scc": {"sf0.1": scc01, "sf1": scc1}}))

    if with_sf3:
        spark.catalog.clearCache()
        split3 = _graph_ann_split(spark, "_scale/sf3")
        sf3 = json.load(open("SF3_BENCH.json"))
        sf3["graph_ann_split"] = {"sf0.1": split01, "sf3": split3}
        sf3.setdefault("notes", []).append(
            "graph_ann_split re-measured post adaptive-seed-stride"
            " (tools/patch_sf_split.py)"
        )
        _exponent_pass(sf3, 30.0)
        json.dump(sf3, open("SF3_BENCH.json", "w"), indent=2)
        print(json.dumps({"sf3_split": split3}))
    spark.stop()


def _exponent_pass(artifact: dict, factor: float) -> None:
    """Round-9 VERDICT item 4: replace the generous factor^2
    'linear_or_better' flag with the observed scaling exponent
    (log ratio / log factor), flag >1.2 as superlinear, and annotate
    quadratic-OUTPUT ops so algorithm and corpus construction read
    apart."""
    for entry in artifact.get("queries", {}).values():
        ratio = entry.get("observed_ratio")
        pred = entry.get(
            "predicted_exponent",
            2.0 if entry.get("predicted_ratio_upper", 0) >= factor**2 else 1.0,
        )
        obs = (
            round(math.log(ratio) / math.log(factor), 2)
            if ratio and ratio > 0
            else None
        )
        entry.pop("predicted_ratio_upper", None)
        entry.pop("linear_or_better", None)
        entry["predicted_exponent"] = pred
        entry["observed_exponent"] = obs
        entry["superlinear"] = obs is not None and obs > 1.2
        entry["quadratic_output_on_this_corpus"] = pred >= 2.0


if __name__ == "__main__":
    main()
