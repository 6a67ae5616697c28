"""Per-query job/stage census: a HOST-NOISE-FREE optimization signal.

This round's sandbox shows 10-30x multi-minute slow phases (identical
code: q_mm_jpeg 1.8 s in one session, 30 s in another 20 min later), so
absolute per-query seconds cannot rank optimization targets. Job and
stage counts CAN: they are deterministic for a given plan + data, and at
fixture scale wall time is floor-bound by them (PROGRESS round-7: a warm
mapInPandas job is ~0.3 s, a JVM agg job ~0.15 s regardless of rows) —
while every stage boundary is an Exchange, so cutting them is also the
scale story.

Method: per query, one warmup run (codegen + shared `_cached_frame`
index builds, billed to the build per repo convention), then one counted
run inside its own job group; report jobs, stages and tasks from the
status tracker.

Usage: python tools/job_census.py [sf_dir] [--json PATH] [--only a,b,c]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import run_once  # noqa: E402
from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = list(sys.argv[1:])
    out_path = None
    only = None
    if "--json" in args:
        i = args.index("--json")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--only" in args:
        i = args.index("--only")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = only if only else sorted(QUERIES)
    spark = get_spark("job-census")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for n in names:
        try:
            run_once(spark, n, sf_dir)  # warmup: codegen + index builds
        except Exception as exc:  # noqa: BLE001
            print(f"[census] WARMUP FAIL {n}: {exc}", file=sys.stderr)
            continue
        sc.setJobGroup(f"census:{n}", n)
        try:
            secs = run_once(spark, n, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"[census] FAIL {n}: {exc}", file=sys.stderr)
            continue
        finally:
            sc.setJobGroup(None, None)
        jids = tracker.getJobIdsForGroup(f"census:{n}")
        stages = 0
        tasks = 0
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    stages += 1
                    tasks += si.numTasks
        out[n] = {
            "jobs": len(jids),
            "stages": stages,
            "tasks": tasks,
            "warm_sec": round(secs, 3),
        }
    ranked = sorted(out.items(), key=lambda kv: (-kv[1]["jobs"], -kv[1]["stages"]))
    for n, d in ranked:
        print(
            f"[census] jobs={d['jobs']:3d} stages={d['stages']:4d} "
            f"tasks={d['tasks']:5d} warm={d['warm_sec']:8.3f}s  {n}",
            file=sys.stderr,
        )
    payload = {"sf_dir": sf_dir, "queries": dict(ranked)}
    spark.stop()
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(payload, fh, indent=1)
    print(json.dumps({"metric": "job_census", "n": len(out)}))


if __name__ == "__main__":
    main()
