"""Shuffle audit: measured (not asserted) data-motion per headline query.

For each query: execute its own physical plan and read the SQL metrics
off the finalized AQE plan — scan rows/bytes, records and bytes crossing
every shuffle exchange, broadcast bytes, spill. The headline number is
the SHUFFLE RATIO (shuffled records / scanned records): the fraction of
the input that moves over the network. At 100 TB the scan is
embarrassingly parallel and the shuffle is the bottleneck, so this ratio
is the single best predictor of how a plan scales; plan-shape tests pin
WHERE the exchanges are, this tool measures HOW MUCH goes through them.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes one markdown table to stdout; run via make_audit_md() for
SHUFFLE_AUDIT.md regeneration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics_of(node) -> dict[str, int]:
    m = node.metrics()
    it = m.iterator()
    vals: dict[str, int] = {}
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _walk(node, seen: set, acc: dict) -> None:
    nid = node.id()
    if nid in seen:
        return
    seen.add(nid)
    name = node.nodeName()
    vals = _metrics_of(node)
    if name.startswith("Scan"):
        acc["scan_rows"] += vals.get("numOutputRows", 0)
        acc["scan_bytes"] += vals.get("filesSize", 0)
    elif name == "Exchange":
        acc["shuffle_records"] += vals.get("shuffleRecordsWritten", 0)
        acc["shuffle_bytes"] += vals.get("dataSize", 0)
        acc["n_exchanges"] += 1
    elif name == "BroadcastExchange":
        # dataSize here reports the HashedRelation's ALLOCATED capacity
        # (floor 64 MiB), not bytes moved — count rows instead
        acc["broadcast_rows"] += vals.get("numOutputRows", 0)
        acc["n_broadcasts"] += 1
    acc["spill_bytes"] += vals.get("spillSize", 0)
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), seen, acc)
    if "QueryStage" in name:
        _walk(node.plan(), seen, acc)
    if name == "AdaptiveSparkPlan":
        _walk(node.executedPlan(), seen, acc)


def audit_query(df) -> dict:
    """Execute ``df``'s own plan and return its data-motion profile."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    acc = {
        "scan_rows": 0,
        "scan_bytes": 0,
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "broadcast_rows": 0,
        "n_broadcasts": 0,
        "spill_bytes": 0,
        "n_exchanges": 0,
    }
    _walk(qe.executedPlan(), set(), acc)
    acc["shuffle_ratio"] = (
        acc["shuffle_records"] / acc["scan_rows"] if acc["scan_rows"] else 0.0
    )
    return acc


def main() -> None:
    import __spark_entry__ as entry

    from reshape_on_flink_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    queries = entry.queries()
    if len(sys.argv) > 2:
        names = sys.argv[2:]
    else:
        from bench import HEADLINE

        names = list(HEADLINE)
    spark = get_spark("shuffle_audit")
    print("| query | scan rows | shuffle records | ratio | shuffle MB | bcast rows | exch | spill |")
    print("|---|---|---|---|---|---|---|---|")
    for name in names:
        a = audit_query(queries[name](spark, sf_dir))
        print(
            f"| {name} | {a['scan_rows']:,} | {a['shuffle_records']:,} "
            f"| {a['shuffle_ratio']:.3f} | {a['shuffle_bytes']/1e6:.2f} "
            f"| {a['broadcast_rows']:,} | {a['n_exchanges']} "
            f"| {a['spill_bytes']} |"
        )


if __name__ == "__main__":
    main()
