"""Shuffle audit: measured (not asserted) data-motion per headline query.

For each query: execute its plan and read the SQL metrics from the
SQLAppStatusStore (the Spark UI's own per-execution metric store) —
scan rows, records and bytes crossing every shuffle exchange, broadcast
rows, spill. The headline number is the SHUFFLE RATIO (shuffled records
/ scanned records): the fraction of the input that moves over the
network. At 100 TB the scan is embarrassingly parallel and the shuffle
is the bottleneck, so this ratio is the single best predictor of how a
plan scales; plan-shape tests pin WHERE the exchanges are, this tool
measures HOW MUCH goes through them.

The status store is authoritative under AQE: it tracks the re-planned
graph per execution, so reused/replanned subtrees keep their scan
metrics (the direct executedPlan() tree-walk — kept below as
``audit_query_treewalk`` — loses them; that was the round-5 zero-scan
caveat in SHUFFLE_AUDIT.md). Queries that run auxiliary driver jobs
(e.g. k-means training collects) produce several executions; all
executions triggered by the audited action are summed and counted in
``n_execs``.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes one markdown table to stdout; run via make_audit_md() for
SHUFFLE_AUDIT.md regeneration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_UNITS = {"B": 1, "KiB": 1 << 10, "MiB": 1 << 20, "GiB": 1 << 30, "TiB": 1 << 40}


def _metric_total(s: str) -> float:
    """Parse a formatted SQLMetric string to its total.

    Shapes: '43' | '4,000' | '163.0 KiB' |
    'total (min, med, max (stageId: taskId))\\n1.0 MiB (...)'.
    """
    line = s.split("\n")[-1]
    tok = line.split(" (")[0].strip()
    parts = tok.split(" ")
    try:
        if len(parts) == 2 and parts[1] in _UNITS:
            return float(parts[0].replace(",", "")) * _UNITS[parts[1]]
        return float(parts[0].replace(",", ""))
    except ValueError:  # e.g. '(min, med, max)'-only average metrics
        return 0.0


_WANTED = ("number of output rows", "shuffle records written", "data size", "spill size")


def _node_metrics(node, mm) -> dict[str, float]:
    out: dict[str, float] = {}
    ms = node.metrics()
    for j in range(ms.size()):
        m = ms.apply(j)
        if m.name() not in _WANTED:
            continue
        v = mm.get(m.accumulatorId())
        if v.isDefined():
            out[m.name()] = _metric_total(v.get())
    return out


def audit_query(df) -> dict:
    """Execute ``df`` (noop sink) and profile its data motion from the
    status store's finalized AQE plan graph(s)."""
    spark = df.sparkSession
    store = spark._jsparkSession.sharedState().statusStore()

    def _drain() -> None:
        # the status store is fed by the ASYNC listener bus: without a
        # drain, a loaded host can return from save() before the
        # SQLExecutionEnd event lands (query reads as 0 rows) or leak a
        # late execution into the NEXT query's [n_before, size) window
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()

    _drain()
    n_before = store.executionsList().size()
    df.write.format("noop").mode("overwrite").save()
    _drain()
    lst = store.executionsList()
    acc = {
        "scan_rows": 0,
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "broadcast_rows": 0,
        "n_broadcasts": 0,
        "spill_bytes": 0,
        "n_exchanges": 0,
        "n_execs": lst.size() - n_before,
    }
    for i in range(n_before, lst.size()):
        eid = lst.apply(i).executionId()
        mm = store.executionMetrics(eid)
        nodes = store.planGraph(eid).allNodes()
        for k in range(nodes.size()):
            node = nodes.apply(k)
            name = node.name()
            vals = _node_metrics(node, mm)
            if name.startswith("Scan"):  # file/source scans only, not cache re-reads
                acc["scan_rows"] += int(vals.get("number of output rows", 0))
            elif name == "Exchange":
                acc["shuffle_records"] += int(vals.get("shuffle records written", 0))
                acc["shuffle_bytes"] += int(vals.get("data size", 0))
                acc["n_exchanges"] += 1
            elif name == "BroadcastExchange":
                # 'data size' is the HashedRelation's ALLOCATED capacity
                # (floor 64 MiB) — count rows instead
                acc["broadcast_rows"] += int(vals.get("number of output rows", 0))
                acc["n_broadcasts"] += 1
            acc["spill_bytes"] += int(vals.get("spill size", 0))
    acc["shuffle_ratio"] = (
        acc["shuffle_records"] / acc["scan_rows"] if acc["scan_rows"] else 0.0
    )
    return acc


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


def audit_query_treewalk(df) -> dict:
    """Legacy tree-walk profile (loses scan metrics in AQE-replanned
    subtrees — prefer :func:`audit_query`)."""
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
    print("| query | scan rows | shuffle records | ratio | shuffle MB | bcast rows | exch | execs | spill |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name in names:
        a = audit_query(queries[name](spark, sf_dir))
        print(
            f"| {name} | {a['scan_rows']:,} | {a['shuffle_records']:,} "
            f"| {a['shuffle_ratio']:.3f} | {a['shuffle_bytes']/1e6:.2f} "
            f"| {a['broadcast_rows']:,} | {a['n_exchanges']} | {a['n_execs']} "
            f"| {a['spill_bytes']} |"
        )


if __name__ == "__main__":
    main()
