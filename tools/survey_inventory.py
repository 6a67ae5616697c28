"""Regenerate SURVEY.md §2.3b (the authoritative registry inventory).

Usage: ``python tools/survey_inventory.py`` — rewrites the table between the
BEGIN/END markers from the live registry so the survey can never drift from
the code.
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, ".")

from ws_to_kafka_spark.operators import QUERIES  # noqa: E402

BEGIN = "<!-- REGISTRY-INVENTORY:BEGIN -->"
END = "<!-- REGISTRY-INVENTORY:END -->"


def table() -> str:
    rows = ["| queries() key | module | correctness check | summary |",
            "|---|---|---|---|"]
    for name in sorted(QUERIES):
        spec = QUERIES[name]
        mod = inspect.getmodule(spec.fn).__name__.split(".")[-1]
        first = (spec.doc or "").strip().split("\n")[0].rstrip(".").rstrip(":")
        if not first:
            # a blank summary cell undermines the inventory (round-8
            # VERDICT item 6) — the usual cause is a would-be docstring
            # that's actually an expression (e.g. '""" ... """.replace(...)'
            # leaves __doc__ None). Fail loudly instead of emitting it.
            raise SystemExit(f"{name}: empty docstring first line")
        oracle = "DuckDB oracle" if spec.oracle else "rows-only"
        rows.append(f"| `{name}` | {mod} | {oracle} | {first} |")
    return "\n".join(rows)


def main() -> None:
    with open("SURVEY.md", encoding="utf-8") as fh:
        text = fh.read()
    block = f"{BEGIN}\n{table()}\n{END}"
    if BEGIN in text:
        # callable replacement: the table is a literal, and docstring first
        # lines may contain backslashes that re.sub would treat as escapes
        text = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END),
            lambda _m: block,
            text,
            flags=re.S,
        )
    else:
        raise SystemExit("markers not found in SURVEY.md")
    with open("SURVEY.md", "w", encoding="utf-8") as fh:
        fh.write(text)
    print(f"SURVEY.md inventory regenerated: {len(QUERIES)} queries")


if __name__ == "__main__":
    main()
