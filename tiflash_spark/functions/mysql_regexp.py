"""MySQL regexp_instr / regexp_substr / regexp_replace with the EXTENDED
operands — position, occurrence, return_option, match_type (reference
``dbms/src/Functions/StringRegexp.h``; expr/regexp.test drives all
three). Spark's builtins stop at regexp_instr(expr, pat[, group]) and
have no match_type operand, and its 3rd-arg semantics differ from
MySQL's (group index vs start position), so the extended spellings route
to Arrow-batched pandas UDFs (never row-at-a-time Python).

match_type letters (MySQL): i = case-insensitive, c = case-sensitive
(cancels i), m = multi-line anchors, n = '.' matches newline (Python
re.DOTALL), u = unix-only line endings (no-op here). The replacement
string uses MySQL's ``\\N`` backreference spelling — ``\\18`` is group 1
then a literal 8 (Python's re would read group 18), so expansion is
hand-rolled.
"""

import re

_FLAG_MAP = {
    "i": re.IGNORECASE,
    "m": re.MULTILINE,
    "n": re.DOTALL,
}


def _compile(pat, mt):
    flags = re.UNICODE
    for ch in mt or "":
        if ch == "c":
            flags &= ~re.IGNORECASE
        elif ch in _FLAG_MAP:
            flags |= _FLAG_MAP[ch]
    return re.compile(pat, flags)


def _expand(m: re.Match, repl: str) -> str:
    """MySQL backreference expansion: single-digit \\N groups, \\x is a
    literal x, out-of-range groups expand empty."""
    out = []
    i = 0
    while i < len(repl):
        ch = repl[i]
        if ch == "\\" and i + 1 < len(repl):
            nx = repl[i + 1]
            if nx.isdigit():
                g = int(nx)
                out.append((m.group(g) or "") if g <= m.re.groups else "")
            else:
                out.append(nx)
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def instr_py(expr, pat, pos, occur, ret, mt):
    if expr is None or pat is None or pos is None or occur is None \
            or ret is None or mt is None:
        return None
    if pat == "":
        return None  # MySQL raises 3582; the non-strict surface nulls
    pos, occur = int(pos), int(occur)
    if pos < 1 or occur < 1 or pos > len(expr) + 1:
        return 0
    try:
        c = _compile(pat, mt)
    except re.error:
        return None
    for i, m in enumerate(c.finditer(expr, pos - 1), 1):
        if i == occur:
            return m.start() + 1 if not int(ret) else m.end() + 1
    return 0


def substr_py(expr, pat, pos, occur, mt):
    if expr is None or pat is None or pos is None or occur is None \
            or mt is None:
        return None
    if pat == "":
        return None
    pos, occur = int(pos), int(occur)
    if pos < 1 or occur < 1 or pos > len(expr) + 1:
        return None
    try:
        c = _compile(pat, mt)
    except re.error:
        return None
    for i, m in enumerate(c.finditer(expr, pos - 1), 1):
        if i == occur:
            return m.group(0)
    return None


def replace_py(expr, pat, repl, pos, occur, mt):
    if expr is None or pat is None or repl is None or pos is None \
            or occur is None or mt is None:
        return None
    if pat == "":
        return None
    pos, occur = int(pos), int(occur)
    if pos < 1 or pos > len(expr) + 1:
        return expr
    try:
        c = _compile(pat, mt)
    except re.error:
        return None
    matches = list(c.finditer(expr, pos - 1))
    if occur > 0:
        if len(matches) < occur:
            return expr
        m = matches[occur - 1]
        return expr[: m.start()] + _expand(m, repl) + expr[m.end():]
    # occur == 0: replace every match from pos on
    buf = []
    last = 0
    for m in matches:
        buf.append(expr[last:m.start()])
        buf.append(_expand(m, repl))
        last = m.end()
    buf.append(expr[last:])
    return "".join(buf)


def register_regexp_udfs(spark) -> list:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _ri(e: pd.Series, p: pd.Series, pos: pd.Series, oc: pd.Series,
            rt: pd.Series, mt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                instr_py(
                    None if a is None else str(a),
                    None if b is None else str(b),
                    None if c is None or c != c else int(c),
                    None if d is None or d != d else int(d),
                    None if f is None or f != f else int(f),
                    None if g is None else str(g),
                )
                for a, b, c, d, f, g in zip(e, p, pos, oc, rt, mt)
            ],
            dtype=object,
        )

    @pandas_udf("string")
    def _rs(e: pd.Series, p: pd.Series, pos: pd.Series, oc: pd.Series,
            mt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                substr_py(
                    None if a is None else str(a),
                    None if b is None else str(b),
                    None if c is None or c != c else int(c),
                    None if d is None or d != d else int(d),
                    None if g is None else str(g),
                )
                for a, b, c, d, g in zip(e, p, pos, oc, mt)
            ],
            dtype=object,
        )

    @pandas_udf("string")
    def _rr(e: pd.Series, p: pd.Series, r: pd.Series, pos: pd.Series,
            oc: pd.Series, mt: pd.Series) -> pd.Series:
        return pd.Series(
            [
                replace_py(
                    None if a is None else str(a),
                    None if b is None else str(b),
                    None if rp is None else str(rp),
                    None if c is None or c != c else int(c),
                    None if d is None or d != d else int(d),
                    None if g is None else str(g),
                )
                for a, b, rp, c, d, g in zip(e, p, r, pos, oc, mt)
            ],
            dtype=object,
        )

    spark.udf.register("mysql_regexp_instr", _ri)
    spark.udf.register("mysql_regexp_substr", _rs)
    spark.udf.register("mysql_regexp_replace", _rr)
    return ["mysql_regexp_instr", "mysql_regexp_substr",
            "mysql_regexp_replace"]
