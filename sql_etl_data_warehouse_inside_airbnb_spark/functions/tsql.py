"""T-SQL dialect shim: the translation layer that lets a user of the
reference warehouse run their existing T-SQL against this engine.

The reference's entire SQL surface is T-SQL (sql/analysis/*.sql,
sql/data/*.sql): TRY_CAST (Spark-native already), TOP n,
CONVERT(DATE, x), LEN, GETDATE, and the week-truncation idiom
``DATEADD(wk, DATEDIFF(wk, 0, d), 0)`` (sql/data/04_load_calendar.sql:
28). :func:`tsql_to_spark_sql` rewrites that surface to Spark SQL with
T-SQL SEMANTICS preserved — most importantly:

- ``DATEDIFF(part, a, b)`` counts BOUNDARY CROSSINGS, not elapsed
  units: ``DATEDIFF(wk, Sat, Sun) = 1`` even though one day passed
  (week boundary = Sunday under the default DATEFIRST 7, which is how
  Sundays land in the NEXT Monday's week — the reference's #1 silent
  divergence trap, see functions/dates.py).
- integer date literals are offsets from the 1900-01-01 epoch
  (``DATEDIFF(wk, 0, d)``'s 0).
- ``LEN`` ignores trailing spaces (it is length(rtrim(x))).
- ``CHARINDEX(sub, s)`` is 1-based with 0 for absent — exactly
  Spark's ``locate`` with the same argument order.

Scope is the documented reference surface plus the obvious neighbors
(ISNULL, IIF, NEWID, TRY_CONVERT, CONVERT styles 23/112/120,
[bracket] identifiers). TOP is supported at the top level of the
statement (the only place the reference uses it); a nested TOP, TOP n
PERCENT, or WITH TIES raises rather than silently mistranslating.
String literals are DATA: every rewrite skips matches inside
single-quoted literals (T-SQL's doubled-'' escape honored), so
``WHERE note = 'call GETDATE() later'`` survives untouched. Spark's
own two-arg ``datediff(end, start)`` passes through unchanged — but
T-SQL NAMES get T-SQL SEMANTICS (``LEN`` ignores trailing spaces);
run genuinely-Spark SQL without the shim when that matters
(``--dialect spark`` in the CLI). String ``+`` concatenation is NOT
rewritten (ambiguous with arithmetic without a type checker) — the
reference never concatenates with ``+`` in SQL.

Everything returns plain Spark SQL text, so the translated query goes
through the exact same Catalyst path as a native query — the dialect
costs nothing at execution time.
"""

from __future__ import annotations

import re

_EPOCH = "DATE '1900-01-01'"
# day offset of 1899-12-31 (one before epoch Monday): dse/7 counts
# Sunday boundary crossings, see datediff 'wk' below
_PRE_EPOCH = "DATE '1899-12-31'"


def _split_args(argstr: str) -> list[str]:
    """Split a balanced argument string on top-level commas. Commas
    and parens inside string literals AND inside comments are data —
    comment spans are skipped wholesale (kept verbatim in the arg
    text) so ``ISNULL(a, b) -- f(x, y)`` can't split on the comment's
    comma."""
    spans = _literal_spans(argstr)
    args, depth, cur = [], 0, []
    i = 0
    while i < len(argstr):
        # _literal_spans already covers single-quoted, double-quoted,
        # bracketed, and comment spans — no second quote tracker
        end = next((b for a, b in spans if a <= i < b), None)
        if end is not None:
            cur.append(argstr[i:end])
            i = end
            continue
        ch = argstr[i]
        if ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur or args:
        args.append("".join(cur).strip())
    return args


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    """[start, end) spans of text the rewriter must never touch:
    single-quoted string literals (T-SQL's doubled-quote escape
    honored — ``'it''s'`` is ONE literal), double-quoted
    strings/identifiers (QUOTED_IDENTIFIER), ``--`` line comments,
    and ``/* */`` block comments (which NEST in T-SQL). One
    left-to-right scan so a quote inside a comment — or an apostrophe
    inside a double-quoted string — can't open a phantom span that
    swallows the rest of the statement."""
    spans, i, n = [], 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == '"':
            j = sql.find('"', i + 1)
            j = n - 1 if j < 0 else j
            spans.append((i, j + 1))
            i = j + 1
        elif ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            spans.append((i, min(j + 1, n)))
            i = j + 1
        elif ch == "-" and sql[i:i + 2] == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j  # comment ends BEFORE the newline
            spans.append((i, j))
            i = j
        elif ch == "/" and sql[i:i + 2] == "/*":
            depth, j = 1, i + 2
            while j < n and depth:
                if sql[j:j + 2] == "/*":
                    depth, j = depth + 1, j + 2
                elif sql[j:j + 2] == "*/":
                    depth, j = depth - 1, j + 2
                else:
                    j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


def _in_literal(spans: list[tuple[int, int]], pos: int) -> bool:
    return any(a <= pos < b for a, b in spans)


def _sub_outside_literals(pattern: str, repl: str, sql: str) -> str:
    """re.sub that never touches string-literal DATA."""
    out, last = [], 0
    spans = _literal_spans(sql)
    for m in re.finditer(pattern, sql, re.IGNORECASE):
        if _in_literal(spans, m.start()):
            continue
        out.append(sql[last:m.start()])
        out.append(m.expand(repl))
        last = m.end()
    out.append(sql[last:])
    return "".join(out)


def _rewrite_calls(sql: str, name: str, fn) -> str:
    """Replace every ``name(args)`` call (case-insensitive, balanced
    parens) with ``fn(args_list)``. Matches inside string literals are
    DATA and skipped. Arguments are translated first (recursion), and
    scanning resumes AFTER each replacement so the emitted Spark SQL —
    which may contain the lowercase twin of the same name, e.g. T-SQL
    DATEDIFF -> Spark datediff — is never re-matched."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        spans = _literal_spans(sql)
        m = pat.search(sql, pos)
        while m and _in_literal(spans, m.start()):
            m = pat.search(sql, m.end())
        if not m:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            # literals (single- AND double-quoted), brackets, and
            # comments are opaque to paren counting via spans
            end = next((b for a, b in spans if a <= i < b), None)
            if end is not None:
                i = end
                continue
            ch = sql[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parens after {name}( in: {sql}")
        inner = sql[m.end():i - 1]
        # recurse into the arguments first so nested calls of the same
        # name are already translated when fn sees them
        inner = _rewrite_calls(inner, name, fn)
        repl = fn(_split_args(inner))
        sql = sql[:m.start()] + repl + sql[i:]
        pos = m.start() + len(repl)


def _datenorm(expr: str) -> str:
    """T-SQL integer date literal -> offset from the 1900 epoch."""
    if re.fullmatch(r"-?\d+", expr.strip()):
        n = int(expr)
        return _EPOCH if n == 0 else f"date_add({_EPOCH}, {n})"
    return expr


_PARTS = {
    "year": "yy", "yy": "yy", "yyyy": "yy",
    "month": "mm", "mm": "mm", "m": "mm",
    "day": "dd", "dd": "dd", "d": "dd",
    "week": "wk", "wk": "wk", "ww": "wk",
    "hour": "hh", "hh": "hh",
    "minute": "mi", "mi": "mi", "n": "mi",
    "second": "ss", "ss": "ss", "s": "ss",
}


def _dateadd(args: list[str]) -> str:
    if len(args) != 3:
        raise ValueError(f"DATEADD takes 3 args, got {args}")
    part = _PARTS.get(args[0].strip().lower())
    n, d = args[1].strip(), _datenorm(args[2])
    # CASTs: date_add/add_months require INT counts, while a translated
    # DATEDIFF (div arithmetic) is BIGINT
    if part == "dd":
        return f"date_add({d}, CAST({n} AS INT))"
    if part == "wk":
        return f"date_add({d}, CAST(7 * ({n}) AS INT))"
    if part == "mm":
        return f"add_months({d}, CAST({n} AS INT))"
    if part == "yy":
        return f"add_months({d}, CAST(12 * ({n}) AS INT))"
    if part in ("hh", "mi", "ss"):
        unit = {"hh": "HOUR", "mi": "MINUTE", "ss": "SECOND"}[part]
        return f"timestampadd({unit}, {n}, {d})"
    raise ValueError(f"unsupported DATEADD part: {args[0]}")


def _datediff(args: list[str]) -> str:
    if len(args) == 2:
        # Spark's own two-arg datediff(end, start) — pass through so
        # plain Spark SQL survives the shim unchanged
        return f"datediff({args[0]}, {args[1]})"
    if len(args) != 3:
        raise ValueError(f"DATEDIFF takes 3 args, got {args}")
    part = _PARTS.get(args[0].strip().lower())
    a, b = _datenorm(args[1]), _datenorm(args[2])
    if part == "dd":
        return f"datediff({b}, {a})"
    if part == "wk":
        # Sunday-boundary crossings: FLOOR(days-since-1899-12-31 / 7)
        # (1900-01-01 is a Monday; Sundays land at multiples of 7).
        # FLOOR, not `div`: `div` truncates toward zero, so the
        # negative day offsets in (-6, 0) — dates in the week before
        # 1899-12-31 — would collapse into week 0 and Sunday-boundary
        # counts before the epoch would come out one short.
        return (f"(FLOOR(datediff({b}, {_PRE_EPOCH}) / 7)"
                f" - FLOOR(datediff({a}, {_PRE_EPOCH}) / 7))")
    if part == "mm":
        return f"((year({b}) - year({a})) * 12 + month({b}) - month({a}))"
    if part == "yy":
        return f"(year({b}) - year({a}))"
    if part in ("hh", "mi", "ss"):
        unit = {"hh": "HOUR", "mi": "MINUTE", "ss": "SECOND"}[part]
        trunc = {"hh": "hour", "mi": "minute", "ss": "second"}[part]
        # boundary crossings == elapsed units between truncated stamps
        return (f"timestampdiff({unit}, date_trunc('{trunc}', {a}), "
                f"date_trunc('{trunc}', {b}))")
    raise ValueError(f"unsupported DATEDIFF part: {args[0]}")


_STYLES = {
    "23": "yyyy-MM-dd",
    "112": "yyyyMMdd",
    "120": "yyyy-MM-dd HH:mm:ss",
}


def _convert(args: list[str]) -> str:
    if len(args) not in (2, 3):
        raise ValueError(f"CONVERT takes 2-3 args, got {args}")
    typ = args[0].strip()
    expr = args[1]
    base = re.sub(r"\(.*\)", "", typ).strip().upper()
    if len(args) == 3:
        style = args[2].strip()
        if base not in ("VARCHAR", "NVARCHAR", "CHAR"):
            raise ValueError(f"CONVERT style on non-string type: {typ}")
        fmt = _STYLES.get(style)
        if fmt is None:
            raise ValueError(f"unsupported CONVERT style: {style}")
        out = f"date_format({expr}, '{fmt}')"
        # T-SQL truncates the formatted string to the DECLARED length:
        # CONVERT(VARCHAR(10), d, 120) is 'yyyy-MM-dd' (10 chars), not
        # the style's full 19 — the classic date-only idiom. Honor it.
        m = re.fullmatch(r"[A-Za-z]+\s*\(\s*(\d+|MAX)\s*\)", typ,
                         re.IGNORECASE)
        if m and m.group(1).upper() != "MAX":
            n = int(m.group(1))
            if n < len(fmt):  # every _STYLES format is fixed-width
                out = f"substring({out}, 1, {n})"
        return out
    if base in ("VARCHAR", "NVARCHAR", "CHAR"):
        return f"CAST({expr} AS STRING)"
    if base in ("DATETIME", "DATETIME2", "SMALLDATETIME"):
        return f"CAST({expr} AS TIMESTAMP)"
    return f"CAST({expr} AS {base})"


def _try_convert(args: list[str]) -> str:
    if len(args) != 2:
        raise ValueError(f"TRY_CONVERT takes 2 args, got {args}")
    typ = re.sub(r"\(.*\)", "", args[0]).strip().upper()
    # mirror _convert's type map exactly — a mapping present only on
    # the CONVERT side would make valid T-SQL (TRY_CONVERT(DATETIME2,
    # x)) emit invalid Spark SQL
    typ = {"DATETIME": "TIMESTAMP", "DATETIME2": "TIMESTAMP",
           "SMALLDATETIME": "TIMESTAMP", "VARCHAR": "STRING",
           "NVARCHAR": "STRING", "CHAR": "STRING"}.get(typ, typ)
    return f"try_cast({args[1]} AS {typ})"


def tsql_to_spark_sql(sql: str) -> str:
    """Rewrite a T-SQL statement of the reference's dialect surface to
    semantically identical Spark SQL. Raises on constructs outside the
    documented scope instead of mistranslating."""
    # [bracket identifiers] -> `backticks`, outside string literals
    sql = _sub_outside_literals(r"\[([A-Za-z_][\w .]*)\]", r"`\1`", sql)

    # TOP n -> LIMIT n, top-level statement only: exactly one TOP,
    # and its SELECT must be the statement's leading keyword (the only
    # place the reference uses it); anything else — including the
    # PERCENT / WITH TIES variants — raises rather than mistranslating
    tops = [m for m in re.finditer(
        r"\bSELECT(\s+DISTINCT)?\s+TOP\s+\(?\s*(\d+)\s*\)?\s+"
        r"(PERCENT\b|WITH\s+TIES\b)?", sql, re.IGNORECASE)
        if not _in_literal(_literal_spans(sql), m.start())]
    if len(tops) > 1:
        raise ValueError("multiple TOPs are not supported by the shim")
    if tops and tops[0].start() != len(sql) - len(sql.lstrip()):
        raise ValueError("TOP outside the top-level SELECT is not "
                         "supported by the shim")
    if tops:
        m = tops[0]
        if m.group(3):
            raise ValueError("TOP n PERCENT / WITH TIES is not "
                             "supported by the shim")
        distinct = m.group(1) or ""
        n = m.group(2)
        sql = sql[:m.start()] + f"SELECT{distinct} " + sql[m.end():]
        if re.search(r"\bLIMIT\s+\d+\s*;?\s*$", sql, re.IGNORECASE):
            raise ValueError("TOP and LIMIT on the same statement")
        # LIMIT goes on its OWN line: a trailing '-- comment' would
        # otherwise swallow a same-line LIMIT silently
        sql = sql.rstrip().rstrip(";") + f"\nLIMIT {n}"

    sql = _sub_outside_literals(r"\bGETDATE\s*\(\s*\)",
                                "current_timestamp()", sql)
    sql = _sub_outside_literals(r"\bNEWID\s*\(\s*\)", "uuid()", sql)
    sql = _rewrite_calls(sql, "ISNULL",
                         lambda a: f"coalesce({', '.join(a)})")
    sql = _rewrite_calls(sql, "IIF", lambda a: f"if({', '.join(a)})")
    sql = _rewrite_calls(sql, "LEN", lambda a: f"length(rtrim({a[0]}))")
    sql = _rewrite_calls(sql, "CHARINDEX",
                         lambda a: f"locate({', '.join(a)})")
    sql = _rewrite_calls(sql, "DATEADD", _dateadd)
    sql = _rewrite_calls(sql, "DATEDIFF", _datediff)
    sql = _rewrite_calls(sql, "TRY_CONVERT", _try_convert)
    sql = _rewrite_calls(sql, "CONVERT", _convert)
    return sql


def run_tsql(spark, sql: str):
    """Execute a T-SQL statement against the engine: translate, then
    hand Spark SQL the result — the translated text goes through the
    same Catalyst path as native SQL."""
    return spark.sql(tsql_to_spark_sql(sql))
