"""Retract streams — Flink's RowKind-emitting streaming aggregation.

Reference surface:

- ``StreamTableEnvironment.toRetractStream`` / ``toChangelogStream``
  (flink-table/flink-table-api-java-bridge/.../StreamTableEnvironment
  .java): an unbounded grouped aggregation emits, per input row, a
  retraction of its previous result (-U) and the new result (+U) —
  first results are inserts (+I). The canonical emission sequence is
  docs/content/docs/dev/table/concepts/dynamic_tables.md "Table to
  Stream Conversion" (clicks per user: Mary, Bob, Mary, Liz ->
  +I(Mary,1) +I(Bob,1) -U(Mary,1) +U(Mary,2) +I(Liz,1)).
- ``GroupAggFunction.java`` (flink-table-runtime .../aggregate/): the
  retraction-CONSUMING group aggregate — accumulators retract(-U/-D)
  and accumulate(+I/+U), emitting -D when a group's count drains to
  zero. This is what makes TWO-LEVEL aggregations correct in Flink
  (the inner agg's updates arrive as retract pairs at the outer agg).

Spark-first shape: both operators are ``applyInPandasWithState`` over
one key shuffle — batch rows pre-aggregate in pandas (vectorized,
per-key-per-batch partials), the keyed state holds one accumulator row
per key, and emission is the delta pairs. State size = O(keys), not
O(rows). At 100 TB the shuffle is the same one any grouped aggregation
pays; the operator adds only the per-key accumulator map.

Changelog column/constants are shared with ``operators.changelog``
(``_change_type`` with +I/-U/+U/-D), so the batch CDC operators
(``changelog_normalize``, ``snapshot_diff``) consume these streams
directly.
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from reshape_on_flink_spark.operators.changelog import (
    CHANGE_COL,
    DELETE,
    INSERT,
    UPDATE_AFTER,
    UPDATE_BEFORE,
)

#: supported aggregate functions: out_col -> (fn, in_col)
_FNS = ("count", "sum", "avg", "min", "max")


def _out_field(fn: str, in_field) -> "StructField":
    if fn == "count":
        return LongType()
    if fn in ("sum", "avg"):
        return DoubleType()
    return in_field.dataType  # min/max keep the input type


def to_retract_stream(
    sdf: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, str | None]],
    *,
    consume_changelog: bool = False,
    emit_seq: bool = True,
    granularity: str = "batch",
    order_by: str | None = None,
) -> DataFrame:
    """Grouped aggregation over an unbounded stream, emitting Flink's
    retract stream: ``+I`` for a key's first result, then ``-U``(old) /
    ``+U``(new) pairs as it updates, ``-D`` when retractions drain a
    group empty (``GroupAggFunction.java`` emission contract).

    ``aggs`` maps output columns to ``(fn, in_col)`` with fn in
    count/sum/avg/min/max (``("count", None)`` counts rows).

    ``consume_changelog=False`` (default): the input is append-only
    (Flink's *insert-only* table) — every row accumulates.

    ``consume_changelog=True``: the input itself is a changelog carrying
    ``_change_type`` (+I/-U/+U/-D): -U/-D rows RETRACT from the
    accumulators, +I/+U accumulate — the retraction-consuming mode that
    chains two aggregation levels correctly. min/max under retraction
    keep a per-key value-count multiset in state (Flink's
    MinWithRetractAggFunction keeps the same map); count/sum/avg use
    O(1) accumulators.

    ``emit_seq=True`` adds a per-key ``_change_seq`` (monotone across
    batches) so consumers can order a key's changelog without relying
    on sink order — Flink sinks rely on operator emission order, which
    a distributed Spark sink does not preserve.

    ``granularity`` selects the emission contract:

    - ``"batch"`` (default, the scale path): one -U/+U pair per key per
      MICRO-BATCH — the batch's rows pre-aggregate vectorized. This is
      exactly the reference's minibatch mode
      (table.exec.mini-batch.enabled, MiniBatchGroupAggFunction).
    - ``"row"``: Flink's DEFAULT per-record emission
      (GroupAggFunction.processElement): every input row emits its
      -U/+U transition (unchanged aggregates emit nothing, the
      RecordEqualiser rule). Output is O(2x input rows) by contract,
      so the per-row Python walk matches the output cost; rows within
      a batch process in ``order_by`` order when given (pass the
      stream's event/sequence column for deterministic replays),
      else arrival order.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    fields = {f.name: f for f in sdf.schema.fields}
    for out, (fn, col) in aggs.items():
        if fn not in _FNS:
            raise ValueError(f"unsupported aggregate {fn!r} (use {_FNS})")
        if fn != "count" and (col is None or col not in fields):
            raise ValueError(f"aggregate {out!r}: unknown input column {col!r}")
    if consume_changelog and CHANGE_COL not in fields:
        raise ValueError(
            f"consume_changelog=True needs a {CHANGE_COL!r} column "
            "(+I/-U/+U/-D) on the input"
        )
    if granularity not in ("batch", "row"):
        raise ValueError(f"granularity must be 'batch' or 'row', got {granularity!r}")
    if order_by is not None and order_by not in fields:
        raise ValueError(f"unknown order_by column {order_by!r}")

    out_fields = [fields[k] for k in keys]
    out_schema = StructType(
        [StructField(CHANGE_COL, StringType()), *out_fields]
        + [StructField(out, _out_field(fn, fields.get(col or "", None)))
           for out, (fn, col) in aggs.items()]
        + ([StructField("_change_seq", LongType())] if emit_seq else [])
    )
    state_schema = StructType(
        [StructField("acc", BinaryType()), StructField("seq", LongType())]
    )
    agg_items = list(aggs.items())
    need_multiset = consume_changelog and any(
        fn in ("min", "max") for _o, (fn, _c) in agg_items
    )

    def _finalize(acc):
        """accumulator dict -> output values (None group = drained)."""
        if acc["n"] <= 0:
            return None
        row = []
        for out, (fn, col) in agg_items:
            if fn == "count":
                row.append(int(acc["n"]))
            elif fn == "sum":
                # SQL/Flink SumWithRetractAggFunction: SUM over zero
                # non-null inputs is NULL, not 0
                row.append(
                    float(acc[f"s_{out}"]) if acc[f"c_{out}"] > 0 else None
                )
            elif fn == "avg":
                # AvgAggFunction divides by the NON-NULL count
                row.append(
                    float(acc[f"s_{out}"]) / acc[f"c_{out}"]
                    if acc[f"c_{out}"] > 0
                    else None
                )
            else:  # min/max
                if need_multiset:
                    ms = acc[f"m_{out}"]
                    if not ms:
                        row.append(None)
                    else:
                        row.append(min(ms) if fn == "min" else max(ms))
                else:
                    row.append(acc[f"m_{out}"])
        return row

    _SIGN = {INSERT: 1, UPDATE_AFTER: 1, UPDATE_BEFORE: -1, DELETE: -1}

    def _init_acc():
        acc = {"n": 0}
        for out, (fn, col) in agg_items:
            if fn == "sum" or fn == "avg":
                acc[f"s_{out}"] = 0.0
                acc[f"c_{out}"] = 0  # non-null input count (NULLs skipped)
            elif fn in ("min", "max"):
                acc[f"m_{out}"] = [] if need_multiset else None
        return acc

    def _transition(old, new, key_vals):
        """GroupAggFunction emission contract for one old->new step
        (unchanged aggregates emit nothing — the RecordEqualiser rule)."""
        if old is None and new is not None:
            return [[INSERT, *key_vals, *new]]
        if old is not None and new is not None and new != old:
            return [[UPDATE_BEFORE, *key_vals, *old], [UPDATE_AFTER, *key_vals, *new]]
        if old is not None and new is None:
            return [[DELETE, *key_vals, *old]]
        return []

    def _is_null(v):
        # None, or a float NaN (v != v only for NaN)
        return v is None or v != v

    def _upd_minmax_scalar(acc, out, fn, v, sg):
        if _is_null(v):
            return  # Flink Min/MaxWithRetractAggFunction skips NULLs
        if need_multiset:
            ms = acc[f"m_{out}"]
            if sg > 0:
                ms.append(v)
            else:
                ms.remove(v)  # retraction of a never-added value raises
        else:
            cur = acc[f"m_{out}"]
            acc[f"m_{out}"] = (
                v if cur is None else (min(cur, v) if fn == "min" else max(cur, v))
            )

    def run(key, pdfs, state):
        import pandas as pd

        if state.exists:
            blob, seq = state.get
            acc = pickle.loads(blob)
        else:
            acc, seq = None, 0

        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        sort_col = order_by if order_by is not None else (
            "_change_seq"
            if consume_changelog and "_change_seq" in batch.columns
            else None
        )
        if sort_col is not None:
            # a key's changelog must retract in emission order (the
            # multiset remove of a value not yet added is loud)
            batch = batch.sort_values(sort_col, kind="mergesort")

        if acc is None:
            acc = _init_acc()
        key_vals = list(key)
        rows = []

        if consume_changelog:
            sign = batch[CHANGE_COL].map(_SIGN)
            if sign.isna().any():
                bad = batch[CHANGE_COL][sign.isna()].iloc[0]
                raise ValueError(f"unknown {CHANGE_COL} value {bad!r}")
        else:
            sign = None

        if granularity == "row":
            # Flink's default per-record emission
            # (GroupAggFunction.processElement): one transition per row
            signs = sign.tolist() if sign is not None else [1] * len(batch)
            recs = batch.to_dict("records")
            for rec, sg in zip(recs, signs):
                # a fresh accumulator finalizes to None -> +I on first row
                old = _finalize(acc)
                acc["n"] += sg
                for out, (fn, col) in agg_items:
                    if fn in ("sum", "avg"):
                        v = rec[col]
                        if not _is_null(v):  # NULL inputs are skipped
                            acc[f"s_{out}"] += sg * float(v)
                            acc[f"c_{out}"] += sg
                    elif fn in ("min", "max"):
                        _upd_minmax_scalar(acc, out, fn, rec[col], sg)
                rows.extend(_transition(old, _finalize(acc), key_vals))
        else:
            old = _finalize(acc)
            acc["n"] += int(sign.sum()) if sign is not None else len(batch)
            for out, (fn, col) in agg_items:
                if fn in ("sum", "avg"):
                    vals = pd.to_numeric(batch[col], errors="coerce")
                    nn = vals.notna()  # NULL/NaN inputs are skipped
                    if sign is not None:
                        acc[f"s_{out}"] += float((vals[nn] * sign[nn]).sum())
                        acc[f"c_{out}"] += int(sign[nn].sum())
                    else:
                        acc[f"s_{out}"] += float(vals[nn].sum())
                        acc[f"c_{out}"] += int(nn.sum())
                elif fn in ("min", "max"):
                    if need_multiset:
                        for v, sg in zip(
                            batch[col].tolist(),
                            sign.tolist() if sign is not None else [1] * len(batch),
                        ):
                            _upd_minmax_scalar(acc, out, fn, v, sg)
                    else:
                        bvals = batch[col].dropna()
                        if len(bvals):
                            bval = bvals.min() if fn == "min" else bvals.max()
                            _upd_minmax_scalar(acc, out, fn, bval, 1)
            rows.extend(_transition(old, _finalize(acc), key_vals))

        # keep drained groups' state (n=0) so a reborn key's
        # _change_seq continues monotonically past its -D; bound idle
        # keys with streaming.ops.apply_with_ttl if needed
        state.update((pickle.dumps(acc), seq + len(rows)))
        if rows:
            cols = [f.name for f in out_schema.fields]
            if emit_seq:
                rows = [[*r, seq + i] for i, r in enumerate(rows)]
            yield pd.DataFrame(rows, columns=cols)

    # retract rows are immutable events -> append output mode
    return sdf.groupBy(*keys).applyInPandasWithState(
        run, out_schema, state_schema, "append", "NoTimeout"
    )


def retract_stream_to_table(df: DataFrame, keys: list[str]) -> DataFrame:
    """Batch/terminal view of a collected retract stream: the current
    table state (the UPSERT materialization Flink sinks apply) — latest
    change per key by ``_change_seq``, deletes dropped. Thin wrapper
    over ``operators.changelog.changelog_normalize``."""
    from reshape_on_flink_spark.operators.changelog import changelog_normalize

    return changelog_normalize(df, keys, "_change_seq")
