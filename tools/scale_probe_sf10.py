"""sf10 tier of the two-decade scale probe, PER-QUERY PROCESS
ISOLATION (round 13): the first in-process attempt OOMed the shared
48g driver heap inside q_graph_coreness's localCheckpoint chain and
the wedged JVM then failed every later plan — one subprocess per query
gives each a fresh 96g heap and confines failures to their own entry.

Merges results into an existing scale_probe JSON (sf0.1/sf1 tiers) and
recomputes the exponent table.

Usage: python tools/scale_probe_sf10.py BENCH_r13_sf10.json [query ...]
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF10 = os.path.join(REPO, ".bench", "sf10")
REPS = 2

ONE = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from reshape_on_flink_spark.queries import merged
from reshape_on_flink_spark.session import get_spark
queries, _ = merged()
spark = get_spark("sf10_probe")
name, sf_dir = {name!r}, {sf_dir!r}
def run():
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
run()  # warm
s = []
for _ in range({reps}):
    t0 = time.perf_counter(); run(); s.append(time.perf_counter() - t0)
print("RESULT " + json.dumps({{name: round(min(s), 3)}}))
"""


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_r13_sf10.json"
    with open(out_path) as f:
        result = json.load(f)
    names = sys.argv[2:] or result["queries"]
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="96g")
    tier = result["sf"].setdefault("10.0", {})
    for name in names:
        code = ONE.format(repo=REPO, name=name, sf_dir=SF10, reps=REPS)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=3000, env=env,
            )
            line = next(
                (
                    ln for ln in proc.stdout.splitlines()
                    if ln.startswith("RESULT ")
                ),
                None,
            )
            if line is None:
                print(f"ERROR {name}: rc={proc.returncode} "
                      f"{proc.stderr[-400:]}", flush=True)
                continue
            tier.update(json.loads(line[len("RESULT "):]))
            print(name, tier[name], flush=True)
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name}", flush=True)
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)

    expo = {}
    sfs = sorted(result["sf"], key=float)
    for name in result["queries"]:
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
