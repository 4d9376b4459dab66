"""Flink-SQL dialect facade: run reference-style SQL on Spark.

The reference's SQL entry point is ``TableEnvironmentImpl.executeSql``
(flink-table/flink-table-api-java/.../TableEnvironmentImpl.java:723); its
dialect differs from Spark SQL in a small, enumerable set of constructs
(parser surface: flink-sql-parser/.../ddl/, dql/; window TVFs:
flink-table-planner-blink windowing exec nodes). This module translates
those constructs textually and hands the result to ``spark.sql`` — the
rest of the dialect (SELECT/JOIN/GROUP BY/OVER/CTEs/subqueries/set ops)
is already common SQL that Catalyst parses directly.

Translated constructs
---------------------
1. Window TVFs (Flink 1.13 ``TABLE(TUMBLE|HOP|CUMULATE(...))``,
   StreamExecWindowAggregate + SliceAssigners.java:60,76,93):
   - TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTE)
     -> subquery projecting ``window(ts, '5 minute')`` start/end.
   - HOP(TABLE t, DESCRIPTOR(ts), slide, size) -> ``window(ts, size, slide)``.
   - CUMULATE(TABLE t, DESCRIPTOR(ts), step, max) -> expand-join SQL
     mirroring operators.windows.cumulate (same slice math, timestamps out).
   Positional and ``name => value`` arguments both accepted.
2. Legacy group windows (WindowOperator.java:96):
   ``GROUP BY TUMBLE(ts, i)`` -> ``GROUP BY window(ts, 'i')`` and
   TUMBLE_START/TUMBLE_END/HOP_*/SESSION_* -> window.start / window.end
   (SESSION maps to ``session_window``).
3. Scalar-function dialect: every functions.registry entry whose Spark
   rendering differs from its Flink spelling (SPLIT_INDEX, IS_DIGIT,
   CHAR_LENGTH, FROM_BASE64, ...), applied recursively through nested
   calls; PROCTIME() -> current_timestamp().
4. DDL: ``CREATE TABLE ... WITH ('connector'='filesystem','path'=p,
   'format'=f)`` -> ``CREATE TABLE ... USING f LOCATION p``;
   WATERMARK declarations are stripped (Spark SQL has no DDL watermark —
   use DataFrame ``withWatermark``; documented divergence).

5. MATCH_RECOGNIZE (``execute_sql`` only — needs the session): the
   clause is parsed (PARTITION BY / ORDER BY / MEASURES / PATTERN /
   DEFINE with PREV(SYM.col[, n]) -> lag over the partition window) and
   routed through ``operators.cep.match_recognize`` (batch) or
   ``streaming_match_recognize`` (streaming views); MEASURES
   (FIRST/LAST/COUNT/SUM/MIN/MAX/AVG over symbol-prefixed columns,
   MATCH_NUMBER(), CLASSIFIER(), RUNNING/FINAL prefixes) with ONE ROW
   or ALL ROWS PER MATCH and every AFTER MATCH SKIP strategy, on BOTH
   routes (stream == batch pinned in tests/test_table_env.py).

6. ``[LEFT] JOIN r FOR SYSTEM_TIME AS OF l.t ON l.k = r.k``
   (``execute_sql`` only): routed through operators.joins.asof_join
   against a table registered via ``register_versioned_table`` (the
   analog of Flink's versioned-table DDL); INNER drops left rows with
   no version at their rowtime, LEFT keeps them as nulls.

7. DDL/DQL statement surface (flink-sql-parser ddl/ + dql/): SHOW
   TABLES/DATABASES/VIEWS/FUNCTIONS/CATALOGS/CREATE TABLE, DESCRIBE,
   USE db, DROP, CREATE DATABASE/VIEW and ALTER TABLE ... RENAME TO are
   already Spark-native and pass through; the enumerable differences —
   EXPLAIN [details] PLAN FOR, SHOW CURRENT CATALOG/DATABASE,
   USE CATALOG, DROP TEMPORARY, ALTER TABLE ADD(...)/SET(...) — are
   translated, and Flink's module/jar statements error loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from reshape_on_flink_spark.functions.registry import REGISTRY

# the quoted count may already be masked to \x00N\x00 (see _mask_strings)
_INTERVAL_RE = re.compile(
    r"INTERVAL\s+(?:'(\d+)'|\x00(\d+)\x00)\s+(SECOND|MINUTE|HOUR|DAY)S?\b",
    re.IGNORECASE,
)
_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _interval_parts(text: str, parts: list[str]) -> tuple[int, str]:
    m = _INTERVAL_RE.fullmatch(text.strip())
    if not m:
        raise ValueError(f"unsupported interval literal: {text!r}")
    if m.group(1) is not None:
        count = int(m.group(1))
    else:
        count = int(parts[int(m.group(2))].strip("'"))
    return count, m.group(3).lower()


def _interval_to_duration(text: str, parts: list[str]) -> str:
    """``INTERVAL '5' MINUTE`` -> ``5 minute`` (window() duration string)."""
    count, unit = _interval_parts(text, parts)
    return f"{count} {unit}"


def _interval_seconds(text: str, parts: list[str]) -> int:
    count, unit = _interval_parts(text, parts)
    return count * _UNIT_SECONDS[unit]


def _mask_strings(sql: str) -> tuple[str, list[str]]:
    """Replace '...' literals with \x00{i}\x00 placeholders so rewrites
    never touch string contents."""
    parts: list[str] = []

    def repl(m: re.Match) -> str:
        parts.append(m.group(0))
        return f"\x00{len(parts) - 1}\x00"

    return re.sub(r"'(?:[^']|'')*'", repl, sql), parts


def _unmask_strings(sql: str, parts: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: parts[int(m.group(1))], sql)


def _split_top(s: str) -> list[str]:
    """Split on top-level commas (paren-aware; strings already masked)."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i].strip())
            start = i + 1
    tail = s[start:].strip()
    if tail:
        out.append(tail)
    return out


def _find_call(sql: str, names: tuple[str, ...], start: int = 0) -> tuple[str, int, int, str] | None:
    """Find the next ``name( ... )`` call; returns (name, begin, end, args)
    with ``end`` one past the closing paren."""
    pat = re.compile(r"\b(" + "|".join(names) + r")\s*\(", re.IGNORECASE)
    m = pat.search(sql, start)
    if not m:
        return None
    depth, i = 1, m.end()
    while i < len(sql) and depth:
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(f"unbalanced parens after {m.group(1)}")
    return m.group(1).upper(), m.start(), i, sql[m.end() : i - 1]


def _matching_open(text: str, close_idx: int) -> int:
    """Index of the ``(`` matching ``text[close_idx] == ')'``, honoring
    single-quoted string literals ('' escapes); -1 if unbalanced."""
    stack: list[int] = []
    i, n = 0, len(text)
    while i < n:
        ch = text[i]
        if ch == "'":
            i += 1
            while i < n:
                if text[i] == "'":
                    if i + 1 < n and text[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            stack.append(i)
        elif ch == ")":
            open_i = stack.pop() if stack else -1
            if i == close_idx:
                return open_i
        i += 1
    return -1


def _tvf_args(raw: str) -> dict[str, str]:
    """Normalize a window-TVF argument list (positional or name =>)."""
    args: dict[str, str] = {}
    positional: list[str] = []
    for a in _split_top(raw):
        m = re.match(r"(\w+)\s*=>\s*(.*)", a, re.DOTALL)
        if m:
            args[m.group(1).upper()] = m.group(2).strip()
        else:
            positional.append(a)
    for i, a in enumerate(positional):
        args[f"_{i}"] = a
    return args


def _arg(args: dict[str, str], name: str, pos: int) -> str:
    if name in args:
        return args[name]
    return args[f"_{pos}"]


def _strip_table(a: str) -> str:
    m = re.match(r"TABLE\s+(.*)", a.strip(), re.IGNORECASE | re.DOTALL)
    return m.group(1).strip() if m else a.strip()


def _strip_descriptor(a: str) -> str:
    m = re.match(r"DESCRIPTOR\s*\(\s*(.*?)\s*\)\s*$", a.strip(), re.IGNORECASE)
    return m.group(1) if m else a.strip()


_WINDOW_TIME = "__w.end - INTERVAL '0.001' SECOND AS window_time"


def _rewrite_window_tvfs(sql: str, parts: list[str]) -> str:
    """TABLE(TUMBLE|HOP|CUMULATE(...)) -> Spark subquery."""
    while True:
        hit = _find_call(sql, ("TABLE",))
        while hit and not re.match(
            r"\s*(TUMBLE|HOP|CUMULATE)\s*\(", hit[3], re.IGNORECASE
        ):
            hit = _find_call(sql, ("TABLE",), hit[2])
        if not hit:
            return sql
        _, begin, end, outer_args = hit
        fname, _, _, raw = _find_call(outer_args, ("TUMBLE", "HOP", "CUMULATE"))
        args = _tvf_args(raw)
        src = _strip_table(_arg(args, "DATA", 0))
        col = _strip_descriptor(_arg(args, "TIMECOL", 1))
        if fname == "TUMBLE":
            size = _interval_to_duration(_arg(args, "SIZE", 2), parts)
            win = f"window({col}, '{size}')"
        elif fname == "HOP":
            slide = _interval_to_duration(_arg(args, "SLIDE", 2), parts)
            size = _interval_to_duration(_arg(args, "SIZE", 3), parts)
            win = f"window({col}, '{size}', '{slide}')"
        else:  # CUMULATE — mirror operators.windows.cumulate slice math
            step_s = _interval_seconds(_arg(args, "STEP", 2), parts)
            max_s = _interval_seconds(_arg(args, "MAX_SIZE", 3), parts)
            if max_s % step_s != 0:
                raise ValueError("CUMULATE max_size must be a multiple of step")
            n = max_s // step_s
            sub = (
                f"(SELECT * EXCEPT(__ws, __k), "
                f"timestamp_seconds(__ws) AS window_start, "
                f"timestamp_seconds(__ws + __k * {step_s}) AS window_end, "
                f"timestamp_seconds(__ws + __k * {step_s}) - INTERVAL '0.001' SECOND"
                f" AS window_time "
                f"FROM (SELECT *, CAST(unix_micros({col}) / {max_s * 1_000_000} AS BIGINT)"
                f" * {max_s} AS __ws, "
                f"explode(sequence(1, {n})) AS __k FROM {src}) "
                f"WHERE unix_micros({col}) < (__ws + __k * {step_s}) * 1000000)"
            )
            sql = sql[:begin] + sub + sql[end:]
            continue
        sub = (
            f"(SELECT * EXCEPT(__w), __w.start AS window_start, "
            f"__w.end AS window_end, {_WINDOW_TIME} "
            f"FROM (SELECT *, {win} AS __w FROM {src}))"
        )
        sql = sql[:begin] + sub + sql[end:]


_GW_AUX_RE = re.compile(
    r"\b(TUMBLE|HOP|SESSION)_(START|END|ROWTIME|PROCTIME)\s*\(", re.IGNORECASE
)


def _rewrite_legacy_group_windows(sql: str, parts: list[str]) -> str:
    """GROUP BY TUMBLE/HOP/SESSION(col, intervals) + *_START/*_END."""
    # auxiliaries first (they contain the bare names as prefixes)
    while True:
        m = _GW_AUX_RE.search(sql)
        if not m:
            break
        hit = _find_call(sql, (m.group(0)[: m.end() - m.start() - 1].strip(),))
        _, begin, end, _raw = hit
        kind = m.group(2).upper()
        base = "session_window" if m.group(1).upper() == "SESSION" else "window"
        repl = {
            "START": f"{base}.start",
            "END": f"{base}.end",
            "ROWTIME": f"{base}.end - INTERVAL '0.001' SECOND",
            "PROCTIME": f"{base}.end",
        }[kind]
        sql = sql[:begin] + repl + sql[end:]
    # bare assigners (only meaningful inside GROUP BY)
    while True:
        hit = _find_call(sql, ("TUMBLE", "HOP", "SESSION"))
        if not hit:
            return sql
        name, begin, end, raw = hit
        args = _split_top(raw)
        col = args[0]
        if name == "TUMBLE":
            win = f"window({col}, '{_interval_to_duration(args[1], parts)}')"
        elif name == "HOP":
            win = (
                f"window({col}, '{_interval_to_duration(args[2], parts)}', "
                f"'{_interval_to_duration(args[1], parts)}')"
            )
        else:
            win = f"session_window({col}, '{_interval_to_duration(args[1], parts)}')"
        sql = sql[:begin] + win + sql[end:]


def _needs_shim(name: str, template: str) -> bool:
    n_args = len(set(re.findall(r"\{(\d+)\}", template)))
    default = f"{name.lower()}({', '.join('{%d}' % i for i in range(n_args))})"
    return template.replace(" ", "") != default.replace(" ", "")


# Registry entries the *textual* dialect layer must leave alone: keyword
# syntax Spark parses natively (CAST/EXTRACT/...), infix operators whose
# "(" belongs to the operand (IN/BETWEEN/LIKE), window assigners owned by
# _rewrite_*_windows, and functions Spark ships under the same name.
_NOT_TEXTUAL = {
    "CAST", "TRY_CAST", "EXTRACT", "POSITION", "OVERLAY", "TRIM",
    "BETWEEN", "IN", "LIKE", "SIMILAR",
    "TUMBLE", "HOP", "SESSION", "ROW",
    "FIRST_VALUE", "LAST_VALUE",  # Spark-native under the same names
    "OVERLAPS",  # infix period predicate: its "(" belongs to the operand
}

_SHIMS: dict[str, str] = {
    name: e.template
    for name, e in REGISTRY.items()
    if e.template is not None and name not in _NOT_TEXTUAL and _needs_shim(name, e.template)
}


# optional trailing arguments with Flink's documented defaults
# (SqlLibraryOperators: LISTAGG(expr) == LISTAGG(expr, ','))
_ARG_DEFAULTS: dict[str, list[str]] = {"LISTAGG": ["','"]}


def _fill_default_args(name: str, args: list[str]) -> list[str]:
    dflt = _ARG_DEFAULTS.get(name)
    if not dflt:
        return args
    full = len(set(re.findall(r"\{(\d+)\}", _SHIMS[name])))
    while len(args) < full and full - len(args) <= len(dflt):
        args = args + [dflt[len(dflt) - (full - len(args))]]
    return args


def _rewrite_functions(sql: str) -> str:
    """Apply registry shims recursively through nested calls."""
    pos = 0
    while True:
        hit = _find_call(sql, tuple(_SHIMS), pos)
        if not hit:
            return sql
        name, begin, end, raw = hit
        args = [_rewrite_functions(a) for a in _split_top(raw)]
        args = _fill_default_args(name, args)
        try:
            rendered = "(" + _SHIMS[name].format(*args) + ")"  # parens: templates
            # like "{0} rlike {1}" must bind tighter than surrounding operators
        except IndexError as exc:
            raise ValueError(f"{name} expects more arguments, got {len(args)}") from exc
        sql = sql[:begin] + rendered + sql[end:]
        pos = begin + len(rendered)


_ON_NULL_RE = re.compile(r"^(NULL|ABSENT)\s+ON\s+NULL$", re.IGNORECASE)
_KV_RE = re.compile(r"^(?:KEY\s+)?(.+?)\s+VALUE\s+(.+)$", re.IGNORECASE | re.DOTALL)
def _rewrite_json_constructors(sql: str) -> str:
    """Flink SQL:2016 JSON constructors (SqlJsonObjectFunction /
    SqlJsonArrayFunction / IS JSON — all in FlinkSqlOperatorTable):

    - ``JSON_OBJECT([KEY] k VALUE v, ... [NULL|ABSENT ON NULL])`` ->
      ``to_json(named_struct(...))``; Flink's default NULL ON NULL
      keeps null fields (``ignoreNullFields=false``), ABSENT drops
      them (Spark's default).
    - ``JSON_ARRAY(v, ... [ABSENT|NULL ON NULL])`` ->
      ``to_json(array(...))`` with a null filter for Flink's default
      ABSENT ON NULL (array elements must share a type — Spark array
      semantics; Flink's heterogeneous arrays raise there, loudly).
    - ``expr IS [NOT] JSON`` -> ``try_parse_json(expr) IS [NOT] NULL``
      (simple operands: literal/identifier/parenthesized).
    """
    while True:
        hit = _find_call(sql, ("JSON_OBJECT", "JSON_ARRAY"))
        if not hit:
            break
        name, begin, end, raw = hit
        on_null = "NULL" if name == "JSON_OBJECT" else "ABSENT"
        # the ON NULL clause trails the last entry without a comma
        trail = re.search(r"\b(NULL|ABSENT)\s+ON\s+NULL\s*$", raw, re.IGNORECASE)
        if trail:
            on_null = trail.group(1).upper()
            raw = raw[: trail.start()]
        args = _split_top(raw)
        if name == "JSON_OBJECT":
            pairs = []
            for a in args:
                m = _KV_RE.match(a.strip())
                if not m:
                    raise ValueError(
                        f"JSON_OBJECT expects [KEY] k VALUE v entries, got {a!r}"
                    )
                pairs += [m.group(1).strip(), m.group(2).strip()]
            body = f"named_struct({', '.join(pairs)})"
            rendered = (
                f"to_json({body}, map('ignoreNullFields', 'false'))"
                if on_null == "NULL"
                else f"to_json({body})"
            )
        else:
            arr = f"array({', '.join(a.strip() for a in args)})"
            if on_null == "ABSENT":
                arr = f"filter({arr}, x -> x IS NOT NULL)"
            rendered = f"to_json({arr})"
        sql = sql[:begin] + rendered + sql[end:]
    # IS [NOT] JSON: scan the operand backwards (identifier, masked
    # literal, or a call/paren group with balanced parens — a regex
    # cannot balance, so walk)
    while True:
        m = re.search(r"\s+IS\s+(NOT\s+)?JSON\b", sql, re.IGNORECASE)
        if not m:
            break
        end = m.start()
        if end > 0 and sql[end - 1] == ")":
            depth, j = 0, end - 1
            while j >= 0:
                if sql[j] == ")":
                    depth += 1
                elif sql[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            k = j - 1
            while k >= 0 and (sql[k].isalnum() or sql[k] in "_."):
                k -= 1
            start = k + 1
        else:
            k = end - 1
            while k >= 0 and (sql[k].isalnum() or sql[k] in "_.\x00"):
                k -= 1
            start = k + 1
        operand = sql[start:end]
        if not operand.strip():
            raise ValueError("IS JSON without a resolvable operand")
        repl = (
            f"try_parse_json({operand}) IS "
            + ("NULL" if m.group(1) else "NOT NULL")
        )
        sql = sql[:start] + repl + sql[m.end():]
    return sql


def _sql_regex_to_java(pat: str) -> str:
    """SQL SIMILAR TO pattern -> Java regex: ``%`` -> ``.*``, ``_`` ->
    ``.`` (outside character classes / escapes); regex metacharacters
    ``| * + ? ( ) [ ] { }`` pass through — the SQL:2016 SIMILAR grammar
    is a regex with LIKE wildcards. ``\\`` escapes the next char."""
    out, i, in_class = [], 0, False
    while i < len(pat):
        c = pat[i]
        if c == "\\" and i + 1 < len(pat):
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        if c == "[":
            in_class = True
            out.append(c)
        elif c == "]":
            in_class = False
            out.append(c)
        elif not in_class and c == "%":
            out.append(".*")
        elif not in_class and c == "_":
            out.append(".")
        elif not in_class and c == ".":
            out.append("\\.")
        else:
            out.append(c)
        i += 1
    return "".join(out)


_SIMILAR_RE = re.compile(
    r"(\bNOT\s+)?\bSIMILAR\s+TO\s+\x00(\d+)\x00", re.IGNORECASE
)


def _rewrite_similar_to(sql: str, parts: list[str]) -> str:
    """Flink/SQL:2016 ``expr [NOT] SIMILAR TO 'pattern'`` (Spark has no
    SIMILAR TO) -> ``[NOT] RLIKE`` with the converted, anchored regex.
    The operand stays in place; only the operator and masked literal
    change, so precedence is preserved."""

    def repl(m: re.Match) -> str:
        lit = parts[int(m.group(2))]
        pat = _sql_regex_to_java(lit[1:-1].replace("''", "'"))
        parts.append("'^(?:" + pat.replace("'", "''") + ")$'")
        neg = "NOT " if m.group(1) else ""
        return f"{neg}RLIKE \x00{len(parts) - 1}\x00"

    return _SIMILAR_RE.sub(repl, sql)


def _rewrite_unnest(sql: str, multi_fn: str = "inline") -> str:
    """Flink ``[CROSS JOIN] UNNEST(expr) AS t(c, ...)`` (SqlUnnestUtils /
    CommonExecCorrelate) -> Spark LATERAL VIEW.

    - one alias column  -> ``LATERAL VIEW explode(expr) t AS c`` (arrays)
    - N alias columns   -> ``LATERAL VIEW {multi_fn}(expr) t AS c1, ...``
      where ``multi_fn`` is ``inline`` for array<row> (Flink flattens row
      fields to columns) or ``explode`` for maps (key, value). Text alone
      cannot tell a 2-field row array from a map, so ``execute_sql``
      resolves the ambiguity by retrying with ``explode`` when analysis
      of the ``inline`` form fails (see _UNNEST_RETRY)."""
    while True:
        hit = _find_call(sql, ("UNNEST",))
        if not hit:
            return sql
        _, begin, end, expr = hit
        # swallow a preceding "CROSS JOIN" / ","
        prefix = sql[:begin]
        m_pre = re.search(r"(?:CROSS\s+JOIN\s*|,\s*)$", prefix, re.IGNORECASE)
        if m_pre:
            prefix = prefix[: m_pre.start()]
        m_alias = re.match(r"\s*(?:AS\s+)?(\w+)\s*\(\s*([\w\s,]+)\)", sql[end:], re.IGNORECASE)
        if not m_alias:
            raise ValueError("UNNEST requires an AS t(col) alias")
        cols = [c.strip() for c in m_alias.group(2).split(",")]
        fn = "explode" if len(cols) == 1 else multi_fn
        lateral = f" LATERAL VIEW {fn}({expr}) {m_alias.group(1)} AS {', '.join(cols)}"
        sql = prefix + lateral + sql[end + m_alias.end() :]


_STMT_UNSUPPORTED_RE = re.compile(
    r"^\s*(SHOW\s+(?:FULL\s+)?MODULES|SHOW\s+JARS|SHOW\s+JOBS|USE\s+MODULES|"
    r"(?:UN)?LOAD\s+MODULE|ADD\s+JAR|REMOVE\s+JAR)\b",
    re.IGNORECASE,
)


def _rewrite_statements(sql: str) -> str:
    """Flink DDL/DQL statement surface -> Spark catalog SQL.

    Reference parser surface: flink-sql-parser ``ddl/`` (33 classes:
    CREATE/DROP/ALTER TABLE|VIEW|DATABASE|CATALOG|FUNCTION, ...) and
    ``dql/`` (15 SHOW/DESCRIBE/EXPLAIN/USE statements). Most spell
    identically in Spark (SHOW TABLES/DATABASES/VIEWS/FUNCTIONS/
    CREATE TABLE, DESCRIBE, USE db, DROP TABLE/VIEW/DATABASE, ALTER
    TABLE ... RENAME TO); this translates the enumerable differences and
    rejects Flink's module/jar management loudly (no catalog analog).
    """
    m = _STMT_UNSUPPORTED_RE.match(sql)
    if m:
        raise NotImplementedError(
            f"{' '.join(m.group(1).upper().split())}: Flink module/jar "
            "management has no Spark catalog analog"
        )
    # CREATE/DROP CATALOG (SqlCreateCatalog.java): Spark catalogs are
    # plugins configured at session start (spark.sql.catalog.<name>),
    # not DDL-creatable — refuse loudly and point at the two real
    # mechanisms instead of letting Spark's parser produce a confusing
    # syntax error.
    if re.match(r"^\s*(?:CREATE|DROP)\s+CATALOG\b", sql, re.IGNORECASE):
        raise NotImplementedError(
            "CREATE/DROP CATALOG: Spark catalogs are session-start plugins "
            "(spark.sql.catalog.<name>=<class>); for cross-session object "
            "persistence use TableEnvironment.enable_catalog_persistence / "
            "restore_catalog (DDL journal)"
        )
    # EXPLAIN [CHANGELOG_MODE|ESTIMATED_COST|JSON_EXECUTION_PLAN|
    # PLAN_ADVICE, ...] [PLAN FOR] <stmt>  ->  EXPLAIN <stmt>  (details
    # map to Spark's single formatted plan; Flink allows the detail list
    # with or without PLAN FOR; the statement continues via translate()).
    sql = re.sub(
        r"^(\s*)EXPLAIN\s+"
        r"(?:(?:CHANGELOG_MODE|ESTIMATED_COST|JSON_EXECUTION_PLAN|PLAN_ADVICE)"
        r"\s*(?:,\s*)?)*(?:PLAN\s+FOR\s+)?",
        r"\1EXPLAIN ",
        sql,
        flags=re.IGNORECASE,
    )
    # SHOW CURRENT CATALOG/DATABASE -> scalar SELECTs (same one-row shape)
    sql = re.sub(
        r"^\s*SHOW\s+CURRENT\s+CATALOG\s*;?\s*$",
        "SELECT current_catalog() AS catalog_name",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"^\s*SHOW\s+CURRENT\s+DATABASE\s*;?\s*$",
        "SELECT current_database() AS database_name",
        sql,
        flags=re.IGNORECASE,
    )
    # USE CATALOG c -> SET CATALOG c (SqlUseCatalog.java)
    sql = re.sub(
        r"^\s*USE\s+CATALOG\s+([\w.]+)", r"SET CATALOG \1", sql, flags=re.IGNORECASE
    )
    # DROP TEMPORARY TABLE/VIEW -> DROP TABLE/VIEW (session-scoped both)
    sql = re.sub(
        r"^\s*DROP\s+TEMPORARY\s+(TABLE|VIEW)\b", r"DROP \1", sql, flags=re.IGNORECASE
    )
    # ALTER TABLE t ADD (c T, ...) -> ADD COLUMNS (...); SET ('k'='v') ->
    # SET TBLPROPERTIES (...)  (SqlAlterTableProperties / add-column DDL)
    sql = re.sub(
        r"^(\s*ALTER\s+TABLE\s+[\w.]+\s+)ADD\s*\(",
        r"\1ADD COLUMNS (",
        sql,
        flags=re.IGNORECASE,
    )
    sql = re.sub(
        r"^(\s*ALTER\s+TABLE\s+[\w.]+\s+)SET\s*\(",
        r"\1SET TBLPROPERTIES (",
        sql,
        flags=re.IGNORECASE,
    )
    return sql


_DDL_WITH_RE = re.compile(r"\bWITH\s*\((?P<opts>[^()]*)\)\s*$", re.IGNORECASE | re.DOTALL)
_WATERMARK_RE = re.compile(r",\s*WATERMARK\s+FOR\s+\w+\s+AS\s+[^,)]+", re.IGNORECASE)


def _rewrite_ddl(sql: str, parts: list[str]) -> str:
    """Flink CREATE TABLE ... WITH (connector options) -> Spark USING/LOCATION."""
    m = _DDL_WITH_RE.search(sql)
    if not m or not re.match(r"\s*CREATE\s+(TEMPORARY\s+)?TABLE", sql, re.IGNORECASE):
        return sql
    opts: dict[str, str] = {}
    for kv in _split_top(m.group("opts")):
        k, _, v = kv.partition("=")
        opts[_unmask_strings(k.strip(), parts).strip("' ")] = _unmask_strings(
            v.strip(), parts
        ).strip("' ")
    connector = opts.get("connector", "")
    if connector not in ("filesystem", ""):
        raise NotImplementedError(
            f"connector {connector!r}: only 'filesystem' maps to Spark DDL; "
            "use sources.readers for other formats"
        )
    fmt = opts.get("format", "parquet")
    path = opts.get("path")
    using = f"USING {fmt}" + (f" LOCATION '{path}'" if path else "")
    sql = sql[: m.start()] + using + sql[m.end() :]
    sql = _WATERMARK_RE.sub("", sql)
    # Flink-only column decorations Spark's parser rejects:
    sql = re.sub(r",\s*PRIMARY\s+KEY\s*\([^)]*\)\s*NOT\s+ENFORCED", "", sql, flags=re.IGNORECASE)
    return re.sub(r"\bTIMESTAMP(?:_LTZ)?\s*\(\s*\d\s*\)", "TIMESTAMP", sql, flags=re.IGNORECASE)


class TableEnvironment:
    """``TableEnvironment.create(spark).execute_sql(flink_sql)`` — the
    reference's SQL entry point (TableEnvironmentImpl.java:723), Spark-run.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        # versioned (temporal) tables: name -> rowtime column, the
        # metadata Flink declares via WATERMARK + PRIMARY KEY DDL
        self._versioned: dict[str, str] = {}
        self._journal_path: str | None = None

    @classmethod
    def create(cls, spark: SparkSession) -> "TableEnvironment":
        return cls(spark)

    # -- catalog persistence (SqlCreateCatalog.java analog) ----------------
    #
    # Flink catalogs (hive/jdbc) outlive the session; Spark's session
    # catalog is in-memory unless a Hive metastore is configured (no hive
    # jars in this environment). The Spark-first analog is a DDL JOURNAL:
    # every successful persistent CREATE/DROP/ALTER of a TABLE, VIEW or
    # DATABASE is appended to a file, and a fresh session replays it.
    # Temporary objects are deliberately NOT journaled — Flink's
    # temporary tables/views are session-scoped and never enter a
    # catalog either. Data survives via the tables' external locations.

    # FUNCTION covers Flink's SqlCreateFunction/SqlDropFunction
    # (flink-sql-parser ddl/): persistent SQL-bodied functions journal
    # and replay; TEMPORARY functions are session-scoped in both engines
    # and deliberately not journaled (same rule as temporary tables).
    _JOURNAL_DDL_RE = re.compile(
        r"^\s*(?:CREATE|DROP|ALTER)\s+(?:OR\s+REPLACE\s+)?(?:EXTERNAL\s+)?"
        r"(?:TABLE|VIEW|DATABASE|SCHEMA|FUNCTION)\b",
        re.IGNORECASE,
    )

    def enable_catalog_persistence(self, journal_path: str) -> None:
        """Journal persistent DDL to ``journal_path`` (JSONL, one
        statement per line, append-only). Idempotent across calls."""
        import os

        os.makedirs(os.path.dirname(journal_path) or ".", exist_ok=True)
        self._journal_path = journal_path

    def restore_catalog(self, journal_path: str | None = None) -> int:
        """Replay a DDL journal into this session's catalog; returns the
        number of statements replayed. Errors are loud (a journal is a
        linear history — a failed replay means the catalog drifted)."""
        import json as _json
        import os

        path = journal_path or self._journal_path
        if path is None or not os.path.exists(path):
            return 0
        prev, self._journal_path = self._journal_path, None  # no re-journal
        n = 0
        try:
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    self.execute_sql(_json.loads(line)["sql"])
                    n += 1
        finally:
            self._journal_path = prev
        return n

    def _maybe_journal(self, sql: str) -> None:
        if self._journal_path is None:
            return
        if not self._JOURNAL_DDL_RE.match(sql):
            return
        if re.match(
            r"^\s*(?:CREATE|DROP)\s+(?:OR\s+REPLACE\s+)?TEMPORARY\b",
            sql,
            re.IGNORECASE,
        ):
            return
        import json as _json

        with open(self._journal_path, "a") as fh:
            fh.write(_json.dumps({"sql": sql}) + "\n")

    @staticmethod
    def translate(sql: str, unnest_multi: str = "inline") -> str:
        """Flink SQL -> Spark SQL (pure text; no session needed)."""
        if re.search(r"\bMATCH_RECOGNIZE\b", sql, re.IGNORECASE):
            raise NotImplementedError(
                "MATCH_RECOGNIZE needs the CEP operator, not a text "
                "rewrite — run it through execute_sql (supported subset) "
                "or call operators.cep.match_recognize directly"
            )
        if re.search(r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", sql, re.IGNORECASE):
            raise NotImplementedError(
                "FOR SYSTEM_TIME AS OF needs the asof_join operator, not "
                "a text rewrite — run it through execute_sql against a "
                "register_versioned_table() table, or call "
                "operators.joins.asof_join directly"
            )
        masked, parts = _mask_strings(sql)
        masked = _rewrite_statements(masked)
        masked = _rewrite_ddl(masked, parts)
        masked = _rewrite_window_tvfs(masked, parts)
        masked = _rewrite_legacy_group_windows(masked, parts)
        masked = _rewrite_unnest(masked, unnest_multi)
        masked = _rewrite_similar_to(masked, parts)
        masked = _rewrite_json_constructors(masked)
        masked = re.sub(r"\bPROCTIME\s*\(\s*\)", "current_timestamp()", masked, flags=re.IGNORECASE)
        masked = _rewrite_functions(masked)
        return _unmask_strings(masked, parts)

    _STMT_SET_RE = re.compile(
        r"^\s*(?:EXECUTE\s+STATEMENT\s+SET\s+BEGIN|BEGIN\s+STATEMENT\s+SET\s*;)"
        r"(?P<body>.*?)\bEND\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    # multi-column UNNEST is ambiguous in text: array<row> needs inline(),
    # map needs explode(). Try inline first; a type-mismatch analysis error
    # means the operand was a map -> retry once with explode.
    _UNNEST_MULTI_RE = re.compile(
        r"\bUNNEST\s*\(.*?\)\s*(?:AS\s+)?\w+\s*\(\s*\w+\s*,", re.IGNORECASE | re.DOTALL
    )

    _ANALYZE_RE = re.compile(
        r"\s*ANALYZE\s+TABLE\s+(?P<table>[\w.]+)\s+COMPUTE\s+STATISTICS"
        r"(?:\s+FOR\s+(?:(?P<all>ALL\s+COLUMNS)|COLUMNS\s+(?P<cols>[\w\s,]+?)))?\s*;?\s*$",
        re.IGNORECASE,
    )

    def execute_sql(self, sql: str) -> DataFrame:
        m = self._STMT_SET_RE.match(sql)
        if m:
            return self._execute_statement_set(m.group("body"))
        m = self._ANALYZE_RE.match(sql)
        if m:
            return self._execute_analyze(m)
        m = re.match(
            r"\s*SHOW\s+CREATE\s+TABLE\s+([\w.]+)\s*;?\s*$", sql, re.IGNORECASE
        )
        if m and self._is_temporary(m.group(1)):
            # Flink's SHOW CREATE TABLE covers temporary objects
            # (SqlShowCreateTable.java); Spark's rejects temp views, so
            # synthesize the DDL from the schema
            name = m.group(1)
            cols = ",\n  ".join(
                f"{f.name} {f.dataType.simpleString().upper()}"
                for f in self.spark.table(name).schema.fields
            )
            return self.spark.createDataFrame(
                [(f"CREATE TEMPORARY VIEW {name} (\n  {cols})",)],
                "createtab_stmt string",
            )
        if re.search(r"\bMATCH_RECOGNIZE\s*\(", sql, re.IGNORECASE):
            return self._execute_match_recognize(sql)
        if re.search(r"\bFOR\s+SYSTEM_TIME\s+AS\s+OF\b", sql, re.IGNORECASE):
            return self._execute_temporal_join(sql)
        try:
            out = self.spark.sql(self.translate(sql))
        except Exception as exc:  # AnalysisException: inline() over a map
            if self._UNNEST_MULTI_RE.search(sql) and "inline" in str(exc).lower():
                return self.spark.sql(self.translate(sql, unnest_multi="explode"))
            raise
        # Flink declares versioned (temporal) tables with WATERMARK +
        # PRIMARY KEY DDL; the Spark DDL drops both, so capture the
        # rowtime here to make the table usable in FOR SYSTEM_TIME AS OF
        ddl = re.match(
            r"\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)",
            sql,
            re.IGNORECASE,
        )
        if ddl and re.search(r"\bPRIMARY\s+KEY\b", sql, re.IGNORECASE):
            wm = re.search(r"\bWATERMARK\s+FOR\s+(\w+)\b", sql, re.IGNORECASE)
            if wm:
                self._versioned[ddl.group(1)] = wm.group(1)
        self._maybe_journal(sql)
        return out

    def _execute_analyze(self, m: "re.Match") -> DataFrame:
        """Flink ``ANALYZE TABLE ... COMPUTE STATISTICS`` (flink-sql-parser
        ``SqlAnalyzeTable``; reference collects row count + per-column
        NDV/nulls/min/max into the catalog for the planner).

        Spark-first split: the statement RETURNS the statistics as a
        table (operators/profile.profile_table — one aggregation pass),
        and additionally feeds Spark's own catalog stats (its CBO
        consumes them) when the object is a catalog table — temp views
        have no catalog stats slot in Spark, so for them the returned
        profile IS the product (documented divergence, loud nowhere
        because nothing is dropped)."""
        from pyspark.sql import functions as F

        from reshape_on_flink_spark.operators.profile import profile_table

        table = m.group("table")
        cols = None
        if m.group("cols"):
            cols = [c.strip() for c in m.group("cols").split(",") if c.strip()]
        df = self.spark.table(table)
        if m.group("all") or cols is not None:
            col_sql = "FOR ALL COLUMNS" if m.group("all") else f"FOR COLUMNS {', '.join(cols)}"
            native = f"ANALYZE TABLE {table} COMPUTE STATISTICS {col_sql}"
            profile = profile_table(df, cols=cols)
        else:
            native = f"ANALYZE TABLE {table} COMPUTE STATISTICS"
            profile = df.agg(F.count(F.lit(1)).alias("n_rows"))
        # temp views have no catalog stats slot in Spark — skip the
        # native feed for them ONLY; a failing ANALYZE on a real catalog
        # table must stay loud (CBO silently losing stats is a bug)
        if not self._is_temporary(table):
            self.spark.sql(native)
        return profile

    def _is_temporary(self, table: str) -> bool:
        try:
            return self.spark.catalog.getTable(table).tableType in (
                "TEMPORARY",
                "TEMP",
            )
        except Exception:
            return False  # let the native statement surface the real error

    # -- MATCH_RECOGNIZE (SQL form) -> operators.cep.match_recognize -------
    #
    # Supported subset (the operator's semantics, StreamExecMatch.java:90):
    # ONE ROW / ALL ROWS PER MATCH, every AFTER MATCH SKIP strategy,
    # PATTERN of quantified symbols / alternation groups (greedy +
    # reluctant), DEFINE with current-row refs (SYM.col) and
    # PREV(SYM.col[, n]), MEASURES of FIRST/LAST/COUNT/SUM/MIN/MAX/AVG
    # over symbol-prefixed columns plus MATCH_NUMBER() and (ALL ROWS)
    # CLASSIFIER() with RUNNING-default / FINAL(...) semantics as window
    # frames over (partition, match_id). Loud errors otherwise.
    #
    # A STREAMING source view routes through streaming_match_recognize
    # (incremental NFA in keyed state, all skip strategies): ONE ROW and
    # ALL ROWS PER MATCH, DEFINE compiled to pandas predicates
    # (operators.cep.pandas_predicate, PREV offsets sized into the
    # retained context), full MEASURES computed per completed match
    # inside the stateful operator.

    _MR_SECTION_STOP = (
        r"(?=\bPARTITION\s+BY\b|\bORDER\s+BY\b|\bMEASURES\b|\bONE\s+ROW\b|"
        r"\bALL\s+ROWS\b|\bAFTER\s+MATCH\b|\bPATTERN\s*\(|\bDEFINE\b|$)"
    )

    def _execute_match_recognize(self, sql: str) -> DataFrame:
        from pyspark.sql import functions as F

        from reshape_on_flink_spark.operators.cep import (
            iterative_predicate,
            match_recognize,
            pandas_predicate,
            streaming_match_recognize,
            symbols_of,
        )

        hit = _find_call(sql, ("MATCH_RECOGNIZE",))
        assert hit is not None
        _, begin, end, body = hit
        head = sql[:begin]
        head_r = head.rstrip()
        if head_r.endswith(")"):
            # subquery source: FROM ( <query> ) MATCH_RECOGNIZE (...)
            # — the subquery runs through execute_sql itself (so nested
            # dialect constructs work) and lands in a temp view; the
            # whole parenthesized span is then replaced by the match
            # output view exactly like a named-table source.
            open_i = _matching_open(head_r, len(head_r) - 1)
            if open_i < 0 or not re.search(
                r"\bFROM\s*$", head_r[:open_i], re.IGNORECASE
            ):
                raise NotImplementedError(
                    "MATCH_RECOGNIZE source must be a named table/view or "
                    "a parenthesized subquery directly after FROM"
                )
            sub_sql = head_r[open_i + 1 : -1].strip()
            table = f"__mr_src_{abs(hash(sub_sql)) % 10**8}"
            self.execute_sql(sub_sql).createOrReplaceTempView(table)
            src_start = open_i
        else:
            fm = re.search(r"\bFROM\s+([A-Za-z_][\w.]*)\s*$", head, re.IGNORECASE)
            if not fm:
                raise NotImplementedError(
                    "MATCH_RECOGNIZE source must be a named table/view or "
                    "a parenthesized subquery directly after FROM"
                )
            table = fm.group(1)
            src_start = fm.start(1)

        all_rows = bool(re.search(r"\bALL\s+ROWS\s+PER\s+MATCH\b", body, re.IGNORECASE))
        skip = re.search(r"\bAFTER\s+MATCH\s+SKIP\s+(.*?)\s*" + self._MR_SECTION_STOP,
                         body, re.IGNORECASE | re.DOTALL)
        after_match = "past_last_row"
        if skip:
            s = re.sub(r"\s+", " ", skip.group(1).strip())
            if re.fullmatch(r"PAST LAST ROW", s, re.IGNORECASE):
                after_match = "past_last_row"
            elif re.fullmatch(r"TO NEXT ROW", s, re.IGNORECASE):
                after_match = "to_next_row"
            else:
                sm = re.fullmatch(r"TO (FIRST|LAST) (\w+)", s, re.IGNORECASE)
                if not sm:
                    raise NotImplementedError(f"AFTER MATCH SKIP {s}")
                after_match = f"to_{sm.group(1).lower()} {sm.group(2)}"

        def section(kw: str) -> str | None:
            m = re.search(kw + r"\s+(.*?)\s*" + self._MR_SECTION_STOP, body,
                          re.IGNORECASE | re.DOTALL)
            return m.group(1).strip() if m else None

        part_s = section(r"\bPARTITION\s+BY\b")
        order_s = section(r"\bORDER\s+BY\b")
        measures_s = section(r"\bMEASURES\b")
        if not (part_s and order_s and measures_s):
            raise ValueError("MATCH_RECOGNIZE needs PARTITION BY, ORDER BY and MEASURES")
        pat_hit = _find_call(body, ("PATTERN",))
        if not pat_hit:
            raise ValueError("MATCH_RECOGNIZE needs PATTERN (...)")
        pattern = pat_hit[3].strip()
        # PATTERN (...) WITHIN INTERVAL 'n' UNIT — Flink's time-bounded
        # pattern (SqlMatchRecognize.interval; CEP NFA window pruning)
        within_m = re.search(
            r"\bWITHIN\s+(INTERVAL\s+'\d+'\s+\w+)", body, re.IGNORECASE
        )
        within_sec = _interval_seconds(within_m.group(1), []) if within_m else None
        def_m = re.search(r"\bDEFINE\b\s+(.*)$", body, re.IGNORECASE | re.DOTALL)
        if not def_m:
            raise ValueError("MATCH_RECOGNIZE needs DEFINE")

        part_cols = [c.strip() for c in part_s.split(",")]
        order_specs: list[tuple[str, bool]] = []
        for item in (c.strip() for c in order_s.split(",")):
            dm = re.match(r"(.+?)\s+(ASC|DESC)$", item, re.IGNORECASE)
            if dm:
                order_specs.append((dm.group(1).strip(), dm.group(2).upper() == "ASC"))
            else:
                order_specs.append((item, True))
        order_cols = [c for c, _ in order_specs]
        symbols = symbols_of(pattern)

        src_df = self.spark.table(table)
        streaming = src_df.isStreaming

        if any(not asc for _, asc in order_specs):
            if within_sec is not None:
                raise NotImplementedError(
                    "PATTERN ... WITHIN needs an ascending time-attribute "
                    "ORDER BY (as in Flink); it cannot combine with DESC"
                )
            # DESC scan order (batch): materialize the scan position as a
            # row_number over the directed sort and use it as the single
            # ascending order key everywhere downstream (NFA scan, PREV/
            # NEXT lag frames, FIRST/LAST order structs) — one window,
            # no operator changes.  Streaming keeps Flink's own rule:
            # the primary ORDER BY must be an ascending time attribute
            # (flink-table-planner MatchRecognize validation).
            if streaming:
                raise NotImplementedError(
                    "streaming MATCH_RECOGNIZE requires ascending (rowtime) "
                    "ORDER BY, as in Flink; DESC is supported on batch sources"
                )
            from pyspark.sql import Window as _W

            seq_w = _W.partitionBy(*part_cols).orderBy(
                *[F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_specs]
            )
            src_df = src_df.withColumn("__mr_seq", F.row_number().over(seq_w))
            order_cols = ["__mr_seq"]

        over = (
            f" OVER (PARTITION BY {', '.join(part_cols)} ORDER BY {', '.join(order_cols)})"
        )

        def mr_expr(expr: str) -> str:
            # RUNNING(x) in DEFINE is the default evaluation semantics for
            # row-local/navigation expressions -> unwrap; FINAL is illegal
            # in DEFINE (SQL standard; Flink MatchCodeGenerator rejects it)
            expr = re.sub(r"\bRUNNING\s*\(", "(", expr, flags=re.IGNORECASE)
            if re.search(r"\bFINAL\s*\(", expr, re.IGNORECASE):
                raise NotImplementedError(
                    "FINAL is not allowed in DEFINE (use it in MEASURES)"
                )
            if re.search(
                r"\b(SUM|COUNT|AVG|MIN|MAX|FIRST|LAST)\s*\(", expr, re.IGNORECASE
            ):
                raise AssertionError(
                    "unreachable: aggregate DEFINEs route to iterative_predicate"
                )
            expr = re.sub(
                r"\bPREV\s*\(\s*\w+\.(\w+)\s*(?:,\s*(\d+))?\s*\)",
                lambda m: f"lag({m.group(1)}{', ' + m.group(2) if m.group(2) else ''})" + over,
                expr,
                flags=re.IGNORECASE,
            )
            # NEXT(S.col[, n]) -> lead over the scan order.  Batch-only
            # extension: Flink's streaming NFA cannot look ahead and
            # rejects NEXT in DEFINE; a bounded batch scan can.
            expr = re.sub(
                r"\bNEXT\s*\(\s*\w+\.(\w+)\s*(?:,\s*(\d+))?\s*\)",
                lambda m: f"lead({m.group(1)}{', ' + m.group(2) if m.group(2) else ''})" + over,
                expr,
                flags=re.IGNORECASE,
            )
            return re.sub(r"\b(" + "|".join(symbols) + r")\.", "", expr)

        define: dict = {}
        iter_define: dict = {}
        for item in _split_top(def_m.group(1)):
            dm = re.match(r"(\w+)\s+AS\s+(.+)$", item.strip(), re.IGNORECASE | re.DOTALL)
            if not dm:
                raise ValueError(f"bad DEFINE item: {item!r}")
            d_sym, d_expr = dm.group(1), dm.group(2)
            if re.search(
                r"\b(SUM|COUNT|AVG|MIN|MAX|FIRST|LAST)\s*\(", d_expr, re.IGNORECASE
            ):
                # match-scoped aggregates/navigation (Flink docs
                # match_recognize.md "Aggregations": DEFINE A AS
                # AVG(A.price) < 15) need the partial match -> compile
                # to an IterativeCondition evaluated per NFA branch.
                d_expr = re.sub(r"\bRUNNING\s*\(", "(", d_expr, flags=re.IGNORECASE)
                if re.search(r"\bFINAL\s*\(", d_expr, re.IGNORECASE):
                    raise NotImplementedError(
                        "FINAL is not allowed in DEFINE (use it in MEASURES)"
                    )
                iter_define[d_sym] = iterative_predicate(d_expr, symbols, d_sym)
            else:
                define[d_sym] = (
                    pandas_predicate(d_expr, symbols)
                    if streaming
                    else F.expr(mr_expr(d_expr))
                )
        for s in symbols:
            if s not in define and s not in iter_define:
                # SQL standard / Flink: a pattern variable with no DEFINE
                # "evaluates to true for every row" (match_recognize.md
                # "Define & Measures"; B in the docs aggregation example)
                if streaming:
                    def _always_true(pdf):
                        import pandas as pd

                        return pd.Series(True, index=pdf.index)

                    define[s] = _always_true
                else:
                    define[s] = F.lit(True)

        # measure descriptors (shared batch/streaming):
        # ("match_number"|"classifier", None, alias, None) or
        # ("agg", (FN, sym|None, col|'*'), alias, mode) mode running|final
        parsed = []
        for item in _split_top(measures_s):
            mm = re.match(r"(.+?)\s+AS\s+(\w+)$", item.strip(), re.IGNORECASE | re.DOTALL)
            if not mm:
                raise ValueError(f"bad MEASURES item: {item!r}")
            expr, alias = mm.group(1).strip(), mm.group(2)
            if re.fullmatch(r"MATCH_NUMBER\s*\(\s*\)", expr, re.IGNORECASE):
                parsed.append(("match_number", None, alias, None))
                continue
            if re.fullmatch(r"CLASSIFIER\s*\(\s*\)", expr, re.IGNORECASE):
                if not all_rows:
                    raise NotImplementedError("CLASSIFIER() needs ALL ROWS PER MATCH")
                parsed.append(("classifier", None, alias, None))
                continue
            # RUNNING/FINAL semantics prefix (Flink: ALL ROWS defaults to
            # RUNNING, ONE ROW measures are always FINAL)
            mode = "running" if all_rows else "final"
            sem = re.fullmatch(r"(RUNNING|FINAL)\s*\((.*)\)", expr, re.IGNORECASE | re.DOTALL)

            def _balanced(s: str) -> bool:
                depth = 0
                for ch in s:
                    depth += ch == "("
                    depth -= ch == ")"
                    if depth < 0:
                        return False
                return depth == 0

            # only unwrap a TRUE whole-item wrapper — in an expression
            # like FINAL(SUM(A.p)) - RUNNING(SUM(A.p)) the greedy match
            # is spurious (inner body unbalanced); per-atom wrappers are
            # handled by the expression lifter below
            if sem and _balanced(sem.group(2)):
                if not all_rows:
                    raise NotImplementedError("RUNNING/FINAL only applies to ALL ROWS PER MATCH")
                mode, expr = sem.group(1).lower(), sem.group(2).strip()
            am = re.fullmatch(
                r"(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(?:(\w+)\.)?(\*|\w+)\s*\)",
                expr,
                re.IGNORECASE,
            )
            if am:
                fn, sym, col = am.group(1).upper(), am.group(2), am.group(3)
                if sym is not None and sym not in symbols:
                    raise ValueError(f"MEASURES references unknown symbol {sym!r}")
                if col == "*" and fn != "COUNT":
                    raise NotImplementedError(f"{fn}(*) in MEASURES")
                parsed.append(("agg", (fn, sym, col), alias, mode))
                continue
            # EXPRESSION measures (Flink MatchCodeGenerator: arbitrary
            # expressions over match-scoped aggregates/navigation, e.g.
            # LAST(A.rowtime) - FIRST(A.rowtime)): lift each atom to a
            # placeholder, validate the remainder is plain arithmetic
            # (valid identically in Spark SQL and pandas), and carry the
            # template + atom list. Per-atom RUNNING/FINAL wrappers
            # override the item mode.
            atoms: list = []

            def _lift_atom(m: "re.Match") -> str:
                a_mode = (m.group(1) or "").lower() or mode
                fn, sym, col = m.group(2).upper(), m.group(3), m.group(4)
                if not all_rows:
                    a_mode = "final"
                if sym is not None and sym not in symbols:
                    raise ValueError(f"MEASURES references unknown symbol {sym!r}")
                if col == "*" and fn != "COUNT":
                    raise NotImplementedError(f"{fn}(*) in MEASURES")
                atoms.append((fn, sym, col, a_mode))
                return f" __m{len(atoms) - 1} "

            tmpl = re.sub(
                r"\b(?:(RUNNING|FINAL)\s*\(\s*)?"
                r"(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(?:(\w+)\.)?(\*|\w+)\s*\)"
                r"(?(1)\s*\))",
                _lift_atom,
                expr,
                flags=re.IGNORECASE,
            )
            tmpl = re.sub(
                r"\bMATCH_NUMBER\s*\(\s*\)",
                lambda m: (atoms.append(("MATCH_NUMBER", None, None, mode)) or " __m%d " % (len(atoms) - 1)),
                tmpl,
                flags=re.IGNORECASE,
            )
            if not atoms:
                raise NotImplementedError(f"unsupported MEASURES expression: {expr!r}")
            remainder = re.sub(r"__m\d+", "", tmpl)
            remainder = re.sub(r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?", "", remainder)
            if re.search(r"[A-Za-z_.\"\[\]']", remainder):
                raise NotImplementedError(
                    f"MEASURES expression subset: {expr!r} — only match-scoped "
                    "aggregates/navigation, MATCH_NUMBER(), numeric literals "
                    "and + - * / ( ) are supported in expression measures"
                )
            parsed.append(("expr", (tmpl.strip(), atoms), alias, mode))
        if not parsed:
            raise ValueError("empty MEASURES")

        if streaming:
            # STREAMING route (reference: MATCH_RECOGNIZE is primarily a
            # streaming feature — StreamExecMatch): incremental NFA with
            # all skip strategies; DEFINE via the pandas translator;
            # ONE ROW and ALL ROWS PER MATCH with full RUNNING/FINAL
            # MEASURES, computed per completed match inside the stateful
            # operator (a match only emits whole, so both frames are
            # decided at emission). PREV(col, n) retention: keep exactly
            # max-offset context rows across micro-batch boundaries.
            context_rows = max(
                1,
                max((getattr(p, "max_prev", 0) for p in define.values()), default=0),
                max((getattr(p, "max_prev", 0) for p in iter_define.values()), default=0),
            )
            per_match = streaming_match_recognize(
                src_df,
                partition_by=part_cols,
                order_cols=order_cols,
                pattern=pattern,
                define=define,
                input_cols=src_df.columns,
                after_match=after_match,
                context_rows=context_rows,
                measures=parsed,
                one_row=not all_rows,
                within=within_sec,
                iter_define=iter_define or None,
            )
            view = f"__mr_{abs(hash(sql)) % 10**8}"
            per_match.createOrReplaceTempView(view)
            outer = sql[:src_start] + view + sql[end:]
            return self.execute_sql(outer)

        matched = match_recognize(
            src_df, part_cols, order_cols, pattern, define,
            after_match=after_match, within=within_sec,
            iter_define=iter_define or None,
        )

        order_key = F.struct(*[F.col(c) for c in order_cols])
        sym_col = F.col("matched_symbol")

        def catalyst_agg(fn: str, sym: str | None, col: str):
            cond = sym_col == sym if sym is not None else F.lit(True)
            if col == "*":
                return F.count(F.when(cond, F.lit(1)))
            val = F.when(cond, F.col(col))
            if fn == "FIRST":
                return F.min_by(val, F.when(cond, order_key))
            if fn == "LAST":
                return F.max_by(val, F.when(cond, order_key))
            return getattr(F, fn.lower())(val)

        def _expr_sql(tmpl: str, atoms, alias: str, name_of) -> str:
            # substitute placeholder __mI with its column/SQL fragment;
            # \b keeps __m1 from eating __m10's prefix
            frag = tmpl
            for i, atom in enumerate(atoms):
                frag = re.sub(rf"__m{i}\b", name_of(i, atom), frag)
            return frag

        if all_rows:
            from pyspark.sql import Window as W

            w_base = W.partitionBy(*part_cols, "match_id").orderBy(
                *[F.col(c) for c in order_cols]
            )
            frames = {
                "running": w_base.rowsBetween(W.unboundedPreceding, W.currentRow),
                "final": w_base.rowsBetween(W.unboundedPreceding, W.unboundedFollowing),
            }
            data_cols = [c for c in matched.columns
                         if c not in ("match_id", "matched_symbol", "__mr_seq")]
            pre_cols, out_cols = [], []
            for kind, spec, alias, mode in parsed:
                if kind == "match_number":
                    out_cols.append(((F.col("match_id") + 1), alias))
                elif kind == "classifier":
                    out_cols.append((sym_col, alias))
                elif kind == "agg":
                    out_cols.append((catalyst_agg(*spec).over(frames[mode]), alias))
                else:  # expression over lifted atoms (hidden window cols)
                    tmpl, atoms = spec
                    for i, (fn, sym, col, a_mode) in enumerate(atoms):
                        name = f"__m{i}__{alias}"
                        if fn == "MATCH_NUMBER":
                            pre_cols.append((F.col("match_id") + 1).alias(name))
                        else:
                            pre_cols.append(
                                catalyst_agg(fn, sym, col)
                                .over(frames[a_mode])
                                .alias(name)
                            )
                    frag = _expr_sql(tmpl, atoms, alias, lambda i, _a: f"__m{i}__{alias}")
                    out_cols.append((F.expr(frag), alias))
            base = matched.select("*", *pre_cols) if pre_cols else matched
            per_match = base.select(
                *data_cols, *[c.alias(a) for c, a in out_cols]
            )
        else:
            aggs = []
            for kind, spec, alias, _mode in parsed:
                if kind == "agg":
                    aggs.append(catalyst_agg(*spec).alias(alias))
                elif kind == "expr":
                    tmpl, atoms = spec
                    for i, (fn, sym, col, _am) in enumerate(atoms):
                        if fn != "MATCH_NUMBER":
                            aggs.append(
                                catalyst_agg(fn, sym, col).alias(f"__m{i}__{alias}")
                            )
            one_row = matched.groupBy(*part_cols, "match_id").agg(
                *(aggs or [F.count("*").alias("__n")])
            )
            final_cols = []
            for kind, spec, alias, _mode in parsed:
                if kind == "match_number":
                    final_cols.append((F.col("match_id") + 1).alias(alias))
                elif kind == "agg":
                    final_cols.append(F.col(alias))
                else:
                    tmpl, atoms = spec
                    frag = _expr_sql(
                        tmpl, atoms, alias,
                        lambda i, a: "(match_id + 1)"
                        if a[0] == "MATCH_NUMBER"
                        else f"__m{i}__{alias}",
                    )
                    final_cols.append(F.expr(frag).alias(alias))
            per_match = one_row.select(*part_cols, *final_cols)
        view = f"__mr_{abs(hash(sql)) % 10**8}"
        per_match.createOrReplaceTempView(view)
        outer = sql[:src_start] + view + sql[end:]
        return self.execute_sql(outer)

    # Flink's sqlQuery and executeSql are the same path for queries here.
    sql_query = execute_sql

    def _execute_statement_set(self, body: str) -> DataFrame:
        """Flink statement set (sql/parser dml: BEGIN STATEMENT SET; ...
        END): N INSERTs planned together. Spark has no multi-sink plan for
        batch SQL, so the statements run sequentially in one call — the
        multi-sink analogue for *streams* is one foreachBatch writing N
        sinks (documented); returns the per-statement row counts."""
        masked, parts = _mask_strings(body)
        stmts = [
            _unmask_strings(s, parts).strip()
            for s in masked.split(";")
            if s.strip()
        ]
        counts = []
        for stmt in stmts:
            self.spark.sql(self.translate(stmt))
            counts.append((stmt.split(None, 3)[2] if stmt.upper().startswith("INSERT") else stmt[:40],))
        return self.spark.createDataFrame(counts, "target string")

    # -- FOR SYSTEM_TIME AS OF -> operators.joins.asof_join ----------------

    _TEMPORAL_RE = re.compile(
        r"\bFROM\s+(?P<lt>[\w.]+)(?:\s+(?:AS\s+)?(?!JOIN\b|LEFT\b)(?P<la>\w+))?\s+"
        r"(?P<lj>LEFT\s+(?:OUTER\s+)?)?JOIN\s+(?P<rt>[\w.]+)\s+"
        r"FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(?P<ta>\w+)\.(?P<tc>\w+)"
        r"(?:\s+(?:AS\s+)?(?!ON\b)(?P<ra>\w+))?\s+"
        r"ON\s+(?P<a1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<a2>\w+)\.(?P<k2>\w+)",
        re.IGNORECASE,
    )

    def register_versioned_table(
        self, name: str, df: DataFrame, time_col: str
    ) -> None:
        """Flink versioned-table registration (a dynamic table with a
        rowtime + primary key, usable as the build side of
        ``FOR SYSTEM_TIME AS OF``). ``time_col`` is the version rowtime."""
        df.createOrReplaceTempView(name)
        self._versioned[name] = time_col

    def _execute_temporal_join(self, sql: str) -> DataFrame:
        """``l JOIN r FOR SYSTEM_TIME AS OF l.t ON l.k = r.k`` — each left
        row joins the latest right version with rowtime <= l.t (Flink
        TemporalRowTimeJoinOperator.java:78 semantics), via the
        one-shuffle union/carry-forward asof_join. INNER drops left rows
        with no version; LEFT keeps them with nulls."""
        from pyspark.sql import functions as F

        from reshape_on_flink_spark.operators.joins import asof_join

        m = self._TEMPORAL_RE.search(sql)
        if not m:
            raise NotImplementedError(
                "unsupported FOR SYSTEM_TIME AS OF form; expected "
                "FROM l [AS] a JOIN r FOR SYSTEM_TIME AS OF a.t [AS b] "
                "ON a.k = b.k (or use operators.joins.asof_join)"
            )
        lt, rt = m.group("lt"), m.group("rt")
        la = m.group("la") or lt
        ra = m.group("ra") or rt
        left_outer = bool(m.group("lj"))
        if m.group("ta").lower() != la.lower():
            raise ValueError("AS OF time attribute must come from the left (probe) side")
        if rt not in self._versioned:
            raise ValueError(
                f"{rt!r} is not a versioned table — call "
                "register_versioned_table(name, df, time_col) first "
                "(Flink requires the same: a rowtime + primary key)"
            )
        r_time = self._versioned[rt]
        # map the ON condition's aliases to sides
        pairs = {m.group("a1").lower(): m.group("k1"), m.group("a2").lower(): m.group("k2")}
        if set(pairs) != {la.lower(), ra.lower()}:
            raise ValueError("ON must equate one left column with one right column")
        lkey, rkey = pairs[la.lower()], pairs[ra.lower()]

        left = self.spark.table(lt)
        right = self.spark.table(rt)
        if rkey != lkey:
            right = right.withColumnRenamed(rkey, lkey)
        payload = [c for c in right.columns if c != lkey]
        joined = asof_join(
            left,
            right,
            key=lkey,
            left_time=m.group("tc"),
            right_time=r_time,
            right_payload=payload,
            strict=False,  # version at t includes updates with rowtime == t
        )
        if not left_outer:
            joined = joined.where(F.col(f"asof_{r_time}").isNotNull())
        clash = [c for c in payload if c in left.columns]
        if clash:
            raise ValueError(
                f"right columns {clash} collide with left columns; "
                "project/rename the versioned table first"
            )
        out = joined.select(
            *left.columns, *[F.col(f"asof_{c}").alias(c) for c in payload]
        )
        view = f"__tj_{abs(hash(sql)) % 10**8}"
        out.createOrReplaceTempView(view)
        outer = sql[: m.start()] + f"FROM {view}" + sql[m.end():]
        outer = re.sub(rf"\b(?:{la}|{ra})\.", "", outer, flags=re.IGNORECASE)
        return self.execute_sql(outer)

    def create_statement_set(self) -> "StatementSet":
        return StatementSet(self)

    def create_temporary_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def from_path(self, name: str) -> "Table":
        """pyflink TableEnvironment.from_path: a fluent Table over the
        catalog/temp-view entry (api.table.Table delegates unknown
        attributes to its DataFrame, so DataFrame callers still work)."""
        from reshape_on_flink_spark.api.table import Table

        return Table(self.spark.table(name))

    def from_elements(self, elements, schema: str) -> "Table":
        """pyflink TableEnvironment.from_elements: literal rows."""
        from reshape_on_flink_spark.api.table import Table

        return Table(self.spark.createDataFrame(elements, schema))


class StatementSet:
    """Flink ``StatementSet`` parity (TableEnvironment.createStatementSet):
    collect INSERT statements, execute them as one unit."""

    def __init__(self, tenv: TableEnvironment):
        self._tenv = tenv
        self._stmts: list[str] = []

    def add_insert_sql(self, sql: str) -> "StatementSet":
        self._stmts.append(sql)
        return self

    def execute(self) -> DataFrame:
        return self._tenv._execute_statement_set(";".join(self._stmts))
