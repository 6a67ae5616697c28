"""Interleaved A/B bench: two checkouts of the engine in ONE Spark session.

The round-13 host runs identical code up to ~3x slower minute-to-minute
(warm JVM agg floors measured 0.34-1.0 s apart), so cross-session and
cross-round comparisons are meaningless. This tool times the SAME queries
from two package roots (e.g. a HEAD worktree vs the working tree) inside
one session, alternating A/B blocks so host phases average out, and
reports the ratio of per-query medians (the round-10 ratio-of-medians
rule).

Per block: swap `ws_to_kafka_spark` in sys.modules to the block's root,
clear the Spark cache (module-held index caches die with the swap; the
warmup rebuilds them so both sides bill index prep identically), run one
unmeasured warmup pass over the queries, then `--rounds` measured passes
with bench.py's exact run_once methodology (noop sink, persist_scope,
scc cold eviction).

Usage:
  python tools/ab_bench.py --base /tmp/wt_head --new /root/repo \
      [--blocks 2] [--rounds 2] [--json PATH] q1 [q2 ...]
"""

from __future__ import annotations

import importlib
import json
import sys
import time


def _swap_tree(root: str, all_roots: list[str]):
    for k in [k for k in sys.modules if k.startswith("ws_to_kafka_spark")]:
        del sys.modules[k]
    for r in all_roots:
        while r in sys.path:
            sys.path.remove(r)
    sys.path.insert(0, root)
    ops = importlib.import_module("ws_to_kafka_spark.operators")
    dist = importlib.import_module("ws_to_kafka_spark.operators.distributed")
    dedup = importlib.import_module("ws_to_kafka_spark.operators.dedup")
    return ops.QUERIES, dist, dedup


def _run_once(spark, queries, dist, dedup, name: str, sf_dir: str) -> float:
    if name == "q_graph_scc":
        dedup.evict_sf_dir(sf_dir, kind_prefix="scc_")
    with dist.persist_scope():
        t0 = time.perf_counter()
        queries[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0


def main() -> None:
    args = sys.argv[1:]

    def _opt(flag, default):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    base = _opt("--base", "/tmp/wt_head")
    new = _opt("--new", "/root/repo")
    blocks = int(_opt("--blocks", "2"))
    rounds = int(_opt("--rounds", "2"))
    out_path = _opt("--json", None)
    sf_dir = _opt("--sf", "/root/testdata/sf0.1")
    names = args
    roots = [base, new]

    sys.path.insert(0, new)
    from ws_to_kafka_spark.session import get_spark  # noqa: E402

    spark = get_spark("ab-bench")
    samples: dict[str, dict[str, list[float]]] = {
        n: {"base": [], "new": []} for n in names
    }
    for b in range(blocks):
        for side, root in (("base", base), ("new", new)):
            queries, dist, dedup = _swap_tree(root, roots)
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"ab[{b}/{side}] warmup")
            for n in names:
                _run_once(spark, queries, dist, dedup, n, sf_dir)
            for r in range(rounds):
                for n in names:
                    spark.sparkContext.setJobDescription(
                        f"ab[{b}/{side}/{r}] {n}"
                    )
                    samples[n][side].append(
                        _run_once(spark, queries, dist, dedup, n, sf_dir)
                    )
    result = {}
    for n in names:
        bm = sorted(samples[n]["base"])[len(samples[n]["base"]) // 2]
        nm = sorted(samples[n]["new"])[len(samples[n]["new"]) // 2]
        result[n] = {
            "base_median": round(bm, 3),
            "new_median": round(nm, 3),
            "ratio": round(nm / bm, 3) if bm else None,
            "base_all": [round(x, 3) for x in samples[n]["base"]],
            "new_all": [round(x, 3) for x in samples[n]["new"]],
        }
        print(
            f"[ab] {n}: new {nm:.3f}s vs base {bm:.3f}s "
            f"({result[n]['ratio']}x)",
            file=sys.stderr,
        )
    payload = {"base": base, "new": new, "blocks": blocks, "rounds": rounds,
               "sf_dir": sf_dir, "queries": result}
    spark.stop()
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({n: r["ratio"] for n, r in result.items()}))


if __name__ == "__main__":
    main()
