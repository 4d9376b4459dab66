"""Pass-count profile for the heaviest CEP timeout bench entries
(round 13, verdict r12 #8): does the per-plan re-scan of the base
relation dominate q_cep_timeout_skip / q_cep_timeout_group_opt?

The timeout builder materializes one enumerated-prefix pass per parked
shape (plan); consolidating them into a single pass with a plan-id
column would only pay if the per-pass base scan is the dominant cost.
Measurement: per query, (a) total wall (min of 3), (b) the number of
plans the builder constructs (via a counting hook), (c) the wall of
ONE representative prefix pass in isolation (min of 3). If
plans x single-pass ~= total, scans dominate; a large residual means
the cost sits in the enumeration/aggregation instead.

Usage: python tools/profile_timeout_passes.py [sf_dir]
Emits one JSON line; record the verdict in BASELINE.md either way.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark
    import reshape_on_flink_spark.operators.cep as ocep
    from reshape_on_flink_spark.api import cep as acep

    queries, _ = merged()
    spark = get_spark("profile_passes")
    out = {}
    for name in ("q_cep_timeout_skip", "q_cep_timeout_group_opt"):
        # count plan passes: every plan runs one PatternStream prefix
        # match (flat_select) plus, under a skip mode, one full-pattern
        # mrows pass — count flat_select invocations while building +
        # collecting once
        calls = {"n": 0}
        orig = acep.PatternStream.flat_select

        def counting(self, *a, _o=orig, **kw):
            calls["n"] += 1
            return _o(self, *a, **kw)

        acep.PatternStream.flat_select = counting
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        finally:
            acep.PatternStream.flat_select = orig
        n_passes = calls["n"]

        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(time.perf_counter() - t0)
        total = min(samples)

        # one representative pass: the events scan + window columns +
        # a single two-stage prefix enumeration, timed via the
        # q_cep_timeout query (1 loop-free plan family, same base
        # shape) divided by ITS pass count
        calls["n"] = 0
        acep.PatternStream.flat_select = counting
        try:
            queries["q_cep_timeout"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
        finally:
            acep.PatternStream.flat_select = orig
        ref_passes = calls["n"]
        ref_samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            queries["q_cep_timeout"](spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            ref_samples.append(time.perf_counter() - t0)
        ref_total = min(ref_samples)
        per_pass = ref_total / max(ref_passes, 1)
        out[name] = {
            "total_sec": round(total, 3),
            "n_passes": n_passes,
            "ref_query_sec": round(ref_total, 3),
            "ref_passes": ref_passes,
            "per_pass_est_sec": round(per_pass, 3),
            "scan_share_est": round(min(1.0, n_passes * per_pass / total), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
