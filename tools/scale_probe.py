"""Two-decade scale probe (round 13): one process measures a query
subset at sf0.1 (driver fixture), sf1 (.bench/sf1) and sf10
(.bench/sf10, 100x keyed replication via `SFN_COPIES=100 SFN_DST=...
tools/make_sf1.py`) with the bench methodology (warm pass + per-query
MIN of REPS interleaved passes), so per-query scale exponents come
from one box state instead of cross-round comparisons.

The 100 TB design claims in BASELINE.md/SCALE.md rested on a single
10x step; the second decade pins the exponent and catches constants
that only bite past 10x. Usage:

    python tools/scale_probe.py [out.json] [query ...]

Default subset: the stateful heavy hitters (changelog family, rank
family, CEP timeout family, graph coreness) — the operators whose
state/enumeration cost is the plausible super-linear risk.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = [
    ("/root/testdata/sf0.1", 0.1, 3),
    (os.path.join(REPO, ".bench", "sf1"), 1.0, 3),
    (os.path.join(REPO, ".bench", "sf10"), 10.0, 2),
]

DEFAULT = [
    "q_changelog_join_transitions",
    "q_changelog_window_agg",
    "q_changelog_session_agg",
    "q_retractable_topn",
    "q_updatable_topn",
    "q_cep_timeout",
    "q_cep_timeout_skip",
    "q_cep_timeout_greedy",
    "q_cep_timeout_comb_greedy",
    "q_cep_timeout_group_until",
    "q_cep_timeout_group_opt",
    "q_graph_coreness",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r13_sf10.json"
    names = sys.argv[2:] or DEFAULT

    from reshape_on_flink_spark.queries import merged
    from reshape_on_flink_spark.session import get_spark

    queries, _ = merged()
    spark = get_spark("scale_probe")
    result: dict = {"queries": names, "sf": {}}
    for sf_dir, sf, reps in SF_DIRS:
        if not os.path.isdir(sf_dir):
            print(f"skip {sf_dir}: missing", file=sys.stderr)
            continue

        def run(name: str) -> bool:
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return True
            except Exception as e:  # one failing query must not sink
                print(                # the whole probe
                    f"ERROR {name} @ {sf_dir}: {type(e).__name__}: "
                    f"{str(e)[:300]}",
                    file=sys.stderr, flush=True,
                )
                return False

        dead = {name for name in names if not run(name)}  # warm
        samples = {name: [] for name in names}
        for _ in range(reps):
            for name in names:
                if name in dead:
                    continue
                t0 = time.perf_counter()
                if run(name):
                    samples[name].append(time.perf_counter() - t0)
                else:
                    dead.add(name)
        result["sf"][str(sf)] = {
            name: round(min(s), 3)
            for name, s in samples.items()
            if s
        }
        print(sf_dir, result["sf"][str(sf)], flush=True)
        with open(out_path + ".partial", "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)

    # per-query scale exponents over each decade: t ~ n^e
    expo = {}
    sfs = sorted(result["sf"], key=float)
    for name in names:
        row = {}
        for lo, hi in zip(sfs, sfs[1:]):
            a, b = result["sf"][lo].get(name), result["sf"][hi].get(name)
            if a and b:
                row[f"{lo}->{hi}"] = round(
                    math.log(b / a) / math.log(float(hi) / float(lo)), 3
                )
        expo[name] = row
    result["exponents"] = expo
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"wrote": out_path, "exponents": expo}))


if __name__ == "__main__":
    main()
