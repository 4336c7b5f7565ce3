#!/usr/bin/env python3
"""Headline-query benchmark.

Runs the headline operator set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() action (no driver-side collect of
result payloads), timed after a warm-up of the session on a trivial action.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_unshipped_revenue",
    "q5_local_supplier",
    "q6_forecast",
    "q10_returned",
    "topk_orders_per_customer",
    "rollup_revenue",
    "asof_purchase_click",
    "clicks_before_purchase",
    "dedup_minhash",
    "dedup_exact",
    "ann_bruteforce",
    "text_stats",
    "sessionize",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from frolyk_spark.session import get_spark

    queries = entry_mod.queries()
    spark = get_spark("frolyk_spark_bench")
    spark.range(1).count()  # JVM warm-up

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        dt = round(time.monotonic() - t0, 3)
        per_query[name] = dt
        total += dt
        print(f"# {name}: {dt}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
