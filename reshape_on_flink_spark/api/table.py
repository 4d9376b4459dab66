"""Fluent Table API — the pyflink ``Table`` surface on Spark DataFrames.

Reference: flink-python/pyflink/table/table.py (Table, GroupedTable,
GroupWindowedTable, WindowGroupedTable, OverWindowedTable) and
pyflink/table/window.py (Tumble/Slide/Session/Over descriptors). A
pyflink Table-API program ports mechanically: the relational verbs map
1:1 onto DataFrame transformations (Catalyst does the planning — there
is no engine here, only surface adaptation), group windows map onto
``F.window``/``F.session_window``, and OVER windows onto
``pyspark.sql.Window`` frame specs.

Expressions: every verb accepts pyspark ``Column`` objects or SQL
strings (parsed with ``F.expr``). The legacy Flink string DSL is
honored for its most common suffix forms (``"b.sum as s"``,
``"a.count"``, plain renames ``"a as b"``) — anything else in a string
must be valid Spark SQL, and unknown ``.suffix`` forms raise with the
supported list.

Semantics notes (Flink-exact):
- ``union`` deduplicates (SQL UNION); ``union_all`` does not.
- ``minus`` is EXCEPT DISTINCT (``subtract``); ``minus_all`` keeps
  multiplicity (``exceptAll``); same split for intersect.
- ``join(right)`` without a predicate is a cross join (Table.java
  requires at least one for streaming; batch allows it).
- group windows: the window alias joins the GROUP BY key list and
  ``w.start`` / ``w.end`` / ``w.rowtime`` resolve in select — rowtime
  is ``end - 1ms``, as in Flink's window properties.
- OVER windows: ``Over.partition_by(...).order_by(...).preceding(...)``
  with UNBOUNDED_RANGE / UNBOUNDED_ROW / CURRENT_ROW / CURRENT_RANGE
  markers or row counts; aggregates are applied per select entry.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Flink Over-window boundary markers (pyflink/table/window.py)
UNBOUNDED_ROW = "__unbounded_row__"
UNBOUNDED_RANGE = "__unbounded_range__"
CURRENT_ROW = "__current_row__"
CURRENT_RANGE = "__current_range__"

_SUFFIX_AGGS = {
    "sum": F.sum, "avg": F.avg, "mean": F.avg, "count": F.count,
    "max": F.max, "min": F.min, "stddev": F.stddev, "variance": F.variance,
}
_DSL_RE = re.compile(
    r"^\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*(?:[Aa][Ss]\s+([A-Za-z_]\w*))?\s*$"
)


def _col(field: str | Column) -> Column:
    """A select/filter entry: Column passthrough, Flink suffix DSL, or
    Spark SQL via F.expr."""
    if isinstance(field, Column):
        return field
    m = _DSL_RE.match(field)
    if m:
        base, fn, alias = m.groups()
        fn_l = fn.lower()
        if fn_l in _SUFFIX_AGGS:
            # no-alias DSL aggregates get a deterministic name (pyflink
            # emits EXPR$n; a stable name is strictly more usable)
            return _SUFFIX_AGGS[fn_l](base).alias(alias or f"{base}_{fn_l}")
        raise ValueError(
            f"unsupported Flink string-DSL suffix {fn!r} in {field!r} "
            f"(supported: {sorted(_SUFFIX_AGGS)}); use Spark SQL or a Column"
        )
    return F.expr(field)


def _cols(fields) -> list[Column]:
    return [_col(f) for f in fields]


class Table:
    """pyflink Table analog. ``.df`` exposes the underlying DataFrame."""

    def __init__(self, df: DataFrame):
        self._df = df

    @property
    def df(self) -> DataFrame:
        return self._df

    def __getattr__(self, name: str):
        """Unknown attributes delegate to the DataFrame, so a Table is
        a drop-in superset (collect/show/schema/count/explain-style
        access keeps working); the Table verbs above win on conflicts
        because __getattr__ only fires for missing attributes."""
        return getattr(self._df, name)

    # ---------------------------------------------------- projections
    def select(self, *fields: str | Column) -> "Table":
        return Table(self._df.select(*_cols(fields)))

    def alias(self, field: str, *fields: str) -> "Table":
        return Table(self._df.toDF(field, *fields))

    def filter(self, predicate: str | Column) -> "Table":
        return Table(self._df.where(_col(predicate)))

    where = filter

    def distinct(self) -> "Table":
        return Table(self._df.distinct())

    def add_columns(self, *fields: str | Column) -> "Table":
        return Table(self._df.select("*", *_cols(fields)))

    def add_or_replace_columns(self, *fields: str | Column) -> "Table":
        out = self._df
        for f in fields:
            c = _col(f)
            name = _alias_of(f, c)
            out = out.withColumn(name, c)
        return Table(out)

    def rename_columns(self, *fields: str) -> "Table":
        out = self._df
        for f in fields:
            m = re.match(r"^\s*([A-Za-z_]\w*)\s+[Aa][Ss]\s+([A-Za-z_]\w*)\s*$", f)
            if not m:
                raise ValueError(f"rename_columns wants 'old as new', got {f!r}")
            out = out.withColumnRenamed(m.group(1), m.group(2))
        return Table(out)

    def drop_columns(self, *fields: str) -> "Table":
        return Table(self._df.drop(*fields))

    # ---------------------------------------------------------- joins
    def join(self, right: "Table", join_predicate: str | Column | None = None) -> "Table":
        if join_predicate is None:
            return Table(self._df.crossJoin(right._df))
        return Table(self._df.join(right._df, _col(join_predicate), "inner"))

    def left_outer_join(
        self, right: "Table", join_predicate: str | Column | None = None
    ) -> "Table":
        pred = F.lit(True) if join_predicate is None else _col(join_predicate)
        return Table(self._df.join(right._df, pred, "left_outer"))

    def right_outer_join(self, right: "Table", join_predicate: str | Column) -> "Table":
        return Table(self._df.join(right._df, _col(join_predicate), "right_outer"))

    def full_outer_join(self, right: "Table", join_predicate: str | Column) -> "Table":
        return Table(self._df.join(right._df, _col(join_predicate), "full_outer"))

    def join_lateral(self, table_function_call: str | Column) -> "Table":
        """Correlate with a table function (UDTF) — explode/posexplode/
        inline/json_tuple etc. via generator expressions in select."""
        return Table(self._df.select("*", _col(table_function_call)))

    def left_outer_join_lateral(self, table_function_call: str | Column) -> "Table":
        c = table_function_call
        if isinstance(c, str):
            c = re.sub(r"\b(pos)?explode\s*\(", r"\1explode_outer(", c, count=1)
        return Table(self._df.select("*", _col(c)))

    # ------------------------------------------------------ set ops
    def minus(self, right: "Table") -> "Table":
        return Table(self._df.subtract(right._df))

    def minus_all(self, right: "Table") -> "Table":
        return Table(self._df.exceptAll(right._df))

    def union(self, right: "Table") -> "Table":
        return Table(self._df.union(right._df).distinct())

    def union_all(self, right: "Table") -> "Table":
        return Table(self._df.union(right._df))

    def intersect(self, right: "Table") -> "Table":
        return Table(self._df.intersect(right._df))

    def intersect_all(self, right: "Table") -> "Table":
        return Table(self._df.intersectAll(right._df))

    # ------------------------------------------------- order / limit
    def order_by(self, *fields: str | Column) -> "Table":
        return Table(self._df.orderBy(*_cols(fields)))

    def offset(self, offset: int) -> "Table":
        return Table(self._df.offset(offset))

    def fetch(self, fetch: int) -> "Table":
        return Table(self._df.limit(fetch))

    def limit(self, fetch: int, offset: int = 0) -> "Table":
        out = self._df.offset(offset) if offset else self._df
        return Table(out.limit(fetch))

    # -------------------------------------------------- aggregations
    def group_by(self, *fields: str | Column) -> "GroupedTable":
        return GroupedTable(self._df, list(fields))

    def window(self, window: "GroupWindow") -> "GroupWindowedTable":
        return GroupWindowedTable(self._df, window)

    def over_window(self, over: "OverWindow") -> "OverWindowedTable":
        return OverWindowedTable(self._df, over)

    # ------------------------------------------------------- pythonic
    def map(self, func: Callable, schema: str) -> "Table":
        """Row-set transformation via an Arrow-batched pandas function
        (pyflink Table.map with a pandas UDF)."""

        def run(batches):
            for pdf in batches:
                yield func(pdf)

        return Table(self._df.mapInPandas(run, schema=schema))

    flat_map = map  # same mechanics: the pandas fn may change row count

    # ------------------------------------------------------ terminals
    def to_pandas(self):
        return self._df.toPandas()

    def execute(self) -> DataFrame:
        return self._df

    def execute_insert(self, table_path: str, overwrite: bool = False) -> None:
        mode = "overwrite" if overwrite else "append"
        self._df.write.mode(mode).saveAsTable(table_path)

    insert_into = execute_insert

    def get_schema(self):
        return self._df.schema

    def print_schema(self) -> None:
        self._df.printSchema()

    def explain(self) -> str:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            self._df.explain("formatted")
        return buf.getvalue()


def _alias_of(field: str | Column, col: Column) -> str:
    """Output name of a select entry (for withColumn-style verbs)."""
    if isinstance(field, str):
        m = re.search(r"[Aa][Ss]\s+([A-Za-z_]\w*)\s*$", field)
        if m:
            return m.group(1)
        if re.match(r"^\s*[A-Za-z_]\w*\s*$", field):
            return field.strip()
    name = col._jc.toString()
    m = re.search(r"AS (\w+)\s*$", name)
    if m:
        return m.group(1)
    if re.match(r"^[A-Za-z_]\w*$", name):
        return name
    raise ValueError(
        f"cannot infer a column name from {field!r}; alias it ('expr as name')"
    )


class GroupedTable:
    """group_by(...).select(aggregates) — fields naming grouping keys
    pass through; everything else is an aggregate expression."""

    def __init__(self, df: DataFrame, keys: list):
        self._df = df
        self._keys = keys

    def select(self, *fields: str | Column) -> Table:
        key_cols = [_col(k) for k in self._keys]
        key_names = {_alias_of(k, c) for k, c in zip(self._keys, key_cols)}
        out_names = [_projection_name(f) for f in fields]
        aggs = [
            _col(f) for f, n in zip(fields, out_names) if n not in key_names
        ]
        if not aggs:
            raise ValueError("group_by().select() needs at least one aggregate")
        out = self._df.groupBy(*key_cols).agg(*aggs)
        # project to the requested order (keys may appear anywhere)
        return Table(out.select(*out_names))


def _projection_name(field: str | Column) -> str:
    if isinstance(field, Column):
        return _alias_of(field, field)
    m = re.search(r"[Aa][Ss]\s+([A-Za-z_]\w*)\s*$", field)
    if m:
        return m.group(1)
    m = _DSL_RE.match(field)
    if m:
        return m.group(3) or f"{m.group(1)}_{m.group(2).lower()}"
    return field.strip()


# ------------------------------------------------------ group windows


class GroupWindow:
    def __init__(self, kind: str):
        self.kind = kind
        self.size: str | None = None
        self.slide: str | None = None
        self.gap: str | None = None
        self.time_col: str | None = None
        self.name: str | None = None


class _TumbleBuilder:
    def over(self, size: str) -> "GroupWindow":
        w = GroupWindow("tumble")
        w.size = size
        return _on_alias(w)


class _SlideBuilder:
    def over(self, size: str):
        w = GroupWindow("slide")
        w.size = size

        class _Every:
            def every(_self, slide: str):
                w.slide = slide
                return _on_alias(w)

        return _Every()


class _SessionBuilder:
    def with_gap(self, gap: str) -> "GroupWindow":
        w = GroupWindow("session")
        w.gap = gap
        return _on_alias(w)


def _on_alias(w: GroupWindow):
    class _OnAlias:
        def on(self, time_col: str):
            w.time_col = time_col
            return self

        def alias(self, name: str) -> GroupWindow:
            w.name = name
            return w

    return _OnAlias()


Tumble = _TumbleBuilder()
Slide = _SlideBuilder()
Session = _SessionBuilder()


class GroupWindowedTable:
    def __init__(self, df: DataFrame, window: GroupWindow):
        self._df = df
        self._w = window

    def group_by(self, *fields: str) -> "WindowGroupedTable":
        w = self._w
        if w.name not in fields:
            raise ValueError(
                f"group_by must include the window alias {w.name!r} (pyflink "
                f"GroupWindowedTable.group_by contract)"
            )
        keys = [f for f in fields if f != w.name]
        if w.time_col is None or w.name is None:
            raise ValueError("window needs .on(time_col).alias(name)")
        if w.kind == "tumble":
            wcol = F.window(w.time_col, w.size)
        elif w.kind == "slide":
            wcol = F.window(w.time_col, w.size, w.slide)
        else:
            wcol = F.session_window(w.time_col, w.gap)
        return WindowGroupedTable(self._df, keys, wcol, w.name)


class WindowGroupedTable:
    def __init__(self, df: DataFrame, keys: list[str], wcol: Column, wname: str):
        self._df = df
        self._keys = keys
        self._wcol = wcol
        self._wname = wname

    def select(self, *fields: str | Column) -> Table:
        grouped = self._df.groupBy(self._wcol.alias("__w"), *self._keys)
        aggs, projections = [], []
        prop_re = re.compile(
            rf"^\s*{re.escape(self._wname)}\.(start|end|rowtime)\s*"
            rf"(?:[Aa][Ss]\s+([A-Za-z_]\w*))?\s*$"
        )
        for f in fields:
            if isinstance(f, str):
                m = prop_re.match(f)
                if m:
                    prop, alias = m.groups()
                    base = F.col("__w.start") if prop == "start" else F.col("__w.end")
                    if prop == "rowtime":  # Flink: window end - 1ms
                        base = F.col("__w.end") - F.expr("INTERVAL 1 MILLISECOND")
                    projections.append(base.alias(alias or f"{self._wname}_{prop}"))
                    continue
                if f.strip() in self._keys:
                    projections.append(F.col(f.strip()))
                    continue
            aggs.append(_col(f))
            projections.append(F.col(_projection_name(f)))
        if not aggs:
            raise ValueError("window select needs at least one aggregate")
        return Table(grouped.agg(*aggs).select(*projections))


# ------------------------------------------------------- over windows


class OverWindow:
    def __init__(self):
        self.parts: list = []
        self.orders: list = []
        self.prec = UNBOUNDED_RANGE
        self.foll: str | int | None = None
        self.name: str | None = None


class _OverBuilder:
    def partition_by(self, *fields):
        w = OverWindow()
        w.parts = list(fields)
        return _OverSteps(w)

    def order_by(self, *fields):
        w = OverWindow()
        w.orders = list(fields)
        return _OverSteps(w)


class _OverSteps:
    def __init__(self, w: OverWindow):
        self._w = w

    def order_by(self, *fields):
        self._w.orders = list(fields)
        return self

    def preceding(self, bound):
        self._w.prec = bound
        return self

    def following(self, bound):
        self._w.foll = bound
        return self

    def alias(self, name: str) -> OverWindow:
        self._w.name = name
        return self._w


Over = _OverBuilder()


def _over_spec(w: OverWindow):
    spec = W.partitionBy(*_cols(w.parts)) if w.parts else W.partitionBy()
    if w.orders:
        spec = spec.orderBy(*_cols(w.orders))
    range_markers = (UNBOUNDED_RANGE, CURRENT_RANGE)
    prec = w.prec
    foll = w.foll
    if foll is None:
        foll = CURRENT_RANGE if prec in range_markers else CURRENT_ROW
    if prec in range_markers or foll in range_markers:
        # Flink OVER defaults: RANGE frame ending at the current row's
        # peers (pyflink/table/window.py Over semantics)
        if not (foll in range_markers or foll == CURRENT_ROW):
            raise ValueError("RANGE frames support CURRENT_RANGE following only")
        lo = W.unboundedPreceding if prec == UNBOUNDED_RANGE else W.currentRow
        return spec.rangeBetween(lo, W.currentRow)
    lo = (
        W.unboundedPreceding if prec == UNBOUNDED_ROW
        else W.currentRow if prec == CURRENT_ROW
        else -int(prec)
    )
    hi = W.currentRow if foll == CURRENT_ROW else int(foll)
    return spec.rowsBetween(lo, hi)


class OverWindowedTable:
    def __init__(self, df: DataFrame, over: OverWindow):
        self._df = df
        self._over = over

    def select(self, **aggs: Column) -> Table:
        """Keyword form: ``select(total=F.sum("v"))`` applies each
        aggregate over the window and aliases it to the keyword (the
        pyflink string form ``"v.sum over w as total"`` needs an
        expression binder; the keyword form is the Column-first API)."""
        spec = _over_spec(self._over)
        cols = [c.over(spec).alias(name) for name, c in aggs.items()]
        return Table(self._df.select("*", *cols))
