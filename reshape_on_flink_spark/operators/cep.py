"""MATCH_RECOGNIZE — SQL row-pattern matching (CEP).

Reference: StreamExecMatch
(flink-table-planner-blink/.../nodes/exec/stream/StreamExecMatch.java:90)
delegating to the flink-cep NFA (flink-libraries/flink-cep/.../operator/
CepOperator.java:81). Supported subset here: a concatenation pattern of
quantified symbols (``A B+ C* D?``), per-symbol boolean DEFINE
conditions, greedy quantifiers with backtracking, and Flink's default
``AFTER MATCH SKIP PAST LAST ROW``. Not supported (loud in docs, not
silently wrong): alternation ``(A|B)``, reluctant quantifiers ``+?``,
``SKIP TO`` variants.

Spark-first split of work:

1. **DEFINE conditions are Catalyst expressions** — evaluated JVM-side
   (whole-stage codegen, may use ``F.lag(...).over(...)`` for Flink's
   ``PREV``) into one boolean column per symbol *before* grouping. The
   Python matcher never evaluates predicates, it only walks bit arrays.
2. **The NFA walk** is `applyInPandas` per partition key: rows arrive
   Arrow-batched, sorted by the order column inside the group; the
   backtracking matcher is O(rows · pattern) except on adversarial
   overlap. Output = matched rows + (match_id, matched_symbol); MEASURES
   are then ordinary Spark aggregations over match_id — keeping the
   aggregation JVM-side instead of hiding it in Python.

100 TB design: one shuffle on the partition key (same as any keyed op);
state is bounded by a single key's rows in one Arrow batch. Skewed keys
hurt exactly like any groupBy — pre-split hot keys upstream if a single
key's history exceeds executor memory (the matcher is sequential per key
by semantics, as in Flink).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(r"^([A-Za-z_]\w*)([+*?]?)$")


def parse_pattern(pattern: str) -> list[tuple[str, str]]:
    """``"A B+ C?"`` -> ``[("A", ""), ("B", "+"), ("C", "?")]``."""
    toks = []
    for raw in pattern.split():
        m = _TOKEN_RE.match(raw)
        if not m:
            raise ValueError(
                f"unsupported pattern token {raw!r} (supported: SYMBOL with "
                "optional +, *, ? — no alternation/reluctant quantifiers)"
            )
        toks.append((m.group(1), m.group(2)))
    if not toks:
        raise ValueError("empty pattern")
    return toks


def _matcher(symbols: list[str], toks: list[tuple[str, str]]):
    """Build the per-group backtracking matcher (pure Python on numpy
    bool arrays; no pandas/Spark objects inside the hot loop)."""
    sym_idx = {s: i for i, s in enumerate(symbols)}
    toks_i = [(sym_idx[s], q) for s, q in toks]

    def match_at(bools, start: int, n: int):
        def rec(ti: int, pos: int):
            if ti == len(toks_i):
                return []
            si, q = toks_i[ti]
            col = bools[si]
            if q == "":
                if pos < n and col[pos]:
                    rest = rec(ti + 1, pos + 1)
                    if rest is not None:
                        return [(pos, si), *rest]
                return None
            if q == "?":
                if pos < n and col[pos]:
                    rest = rec(ti + 1, pos + 1)
                    if rest is not None:
                        return [(pos, si), *rest]
                return rec(ti + 1, pos)
            # greedy + / * with backtracking
            k = 0
            while pos + k < n and col[pos + k]:
                k += 1
            min_k = 1 if q == "+" else 0
            while k >= min_k:
                rest = rec(ti + 1, pos + k)
                if rest is not None:
                    return [(pos + j, si) for j in range(k)] + [*rest]
                k -= 1
            return None

        return rec(0, start)

    return match_at


def match_recognize(
    df: DataFrame,
    partition_by: str | list[str],
    order_by: str | list[str],
    pattern: str,
    define: dict[str, Column],
) -> DataFrame:
    """Rows of every match, annotated with ``match_id`` (0-based ordinal
    within the partition) and ``matched_symbol``.

    ``define`` maps each pattern symbol to a boolean Catalyst expression;
    use ``F.lag(col).over(Window.partitionBy(keys).orderBy(order))`` for
    Flink's ``PREV``. MEASURES: aggregate the returned rows by
    (partition, match_id) with ordinary Spark aggregations.
    """
    partition_by = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    toks = parse_pattern(pattern)
    symbols = sorted({s for s, _ in toks})
    missing = [s for s in symbols if s not in define]
    if missing:
        raise ValueError(f"pattern symbols without DEFINE: {missing}")

    flagged = df
    for s in symbols:
        flagged = flagged.withColumn(f"__sym_{s}", F.coalesce(define[s], F.lit(False)))

    out_fields = [f for f in df.schema.fields]
    schema_out = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields)
        + ", match_id bigint, matched_symbol string"
    )
    match_at = _matcher(symbols, toks)
    data_cols = [f.name for f in out_fields]
    sym_cols = [f"__sym_{s}" for s in symbols]

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        bools = [pdf[c].to_numpy() for c in sym_cols]
        rows_idx, match_ids, matched_syms = [], [], []
        i, mid = 0, 0
        while i < n:
            m = match_at(bools, i, n)
            if m:  # AFTER MATCH SKIP PAST LAST ROW; empty match advances
                for pos, si in m:
                    rows_idx.append(pos)
                    match_ids.append(mid)
                    matched_syms.append(symbols[si])
                i = m[-1][0] + 1
                mid += 1
            else:
                i += 1
        out = pdf.iloc[rows_idx][data_cols].copy()
        out["match_id"] = pd.Series(match_ids, index=out.index, dtype="int64")
        out["matched_symbol"] = pd.Series(matched_syms, index=out.index)
        return out

    return flagged.groupBy(*partition_by).applyInPandas(run, schema=schema_out)
