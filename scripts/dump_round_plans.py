#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/<tag>/<q>_<suffix>.txt.

Usage: python scripts/dump_round_plans.py <tag> <suffix> <query> [query ...]
       (sf dir from $SPARK_GRAFT_SF_DIR, default sf0.01)

The optimization rounds commit these as evidence: <q>_before.txt /
<q>_after.txt under plans/<tag>/ so plan-shape claims (Exchange count,
join strategy, PushedFilters, Python-eval nodes) are auditable without
running Spark.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_visualization_of_cryptocurrency_trading_data_spark.plans.registry import QUERIES
from etl_visualization_of_cryptocurrency_trading_data_spark.session import get_spark


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-round-plans")
    for name in names:
        if name not in QUERIES:
            print(f"skip unknown query {name}", file=sys.stderr)
            continue
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            plan = f"EXPLAIN FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({suffix})\n")
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
