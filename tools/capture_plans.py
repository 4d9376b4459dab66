"""Capture .explain('formatted') for headline queries -> plans/<round>/.

Usage: python tools/capture_plans.py [before|after] [query ...]
Round dir from $PLANS_ROUND (default r14).

Writes plans/r13/<name>_<tag>.txt for each headline query (or the named
subset). Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) — the
same inputs the bench times — so Exchange counts / join strategies /
PushedFilters in the files match the benched plans.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark

    queries, _ = merged()
    spark = get_spark("capture_plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r14"),
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception:
            plan = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", flush=True)


if __name__ == "__main__":
    main()
