"""Full-registry timing sweep at an arbitrary scale (round-13 triage).

The bench's headline set covers 59 of the 261 registry keys; the other
202 are only ever executed at the sf0.01 verify gate. This tool times
EVERY registered query at the given sf_dir (default sf0.1, the driver's
bench scale) with the bench's exact methodology per query — noop sink,
persist_scope, q_graph_scc cold-eviction — so non-headline hotspots
become visible before optimization effort is spent. Triage mode: one
unmeasured warmup pass (codegen + shared index caches, billed to the
build per the repo convention) then median of ``--rounds`` (default 2)
interleaved passes.

Usage: python tools/registry_sweep.py [sf_dir] [--rounds N] [--json PATH]
                                      [--only name,name,...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import run_once  # noqa: E402
from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_path = None
    rounds = 2
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--rounds" in args:
        i = args.index("--rounds")
        rounds = int(args[i + 1])
        del args[i : i + 2]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = only if only else sorted(QUERIES)
    spark = get_spark("registry-sweep")
    spark.sparkContext.setJobDescription("sweep: warmup")
    for n in names:
        try:
            run_once(spark, n, sf_dir)
        except Exception as exc:  # noqa: BLE001 - record, keep sweeping
            print(f"[sweep] WARMUP FAIL {n}: {exc}", file=sys.stderr)
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(rounds):
        for n in names:
            spark.sparkContext.setJobDescription(f"sweep[{r}]: {n}")
            try:
                samples[n].append(run_once(spark, n, sf_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"[sweep] FAIL {n}: {exc}", file=sys.stderr)
    med = {
        n: round(sorted(ts)[len(ts) // 2], 3)
        for n, ts in samples.items()
        if ts
    }
    ranked = sorted(med.items(), key=lambda kv: -kv[1])
    for n, t in ranked:
        print(f"[sweep] {t:8.3f}s  {n}", file=sys.stderr)
    total = round(sum(med.values()), 3)
    payload = {
        "metric": "registry_sweep_sec",
        "value": total,
        "unit": "sec",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "queries": dict(ranked),
    }
    spark.stop()
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({k: payload[k] for k in ("metric", "value", "unit")}))


if __name__ == "__main__":
    main()
