"""MySQL JSON path evaluation (wildcards, multi-path, autowrap).

The reference implements the full MySQL path grammar in its JSON domain
(dbms/src/Functions/FunctionsJson.h; exercised by the reference's
fullstack expr/json_extract.test, json_keys.test, json_contains_path
.test): member access ``.k`` / ``."quoted k"``, array index ``[N]``
(with scalar autowrap: a non-array value acts as ``[value]`` for
``[0]``), the wildcards ``.*`` and ``[*]``, and recursive descent
``**``. Spark's variant path (``variant_get``) covers only plain paths,
so the wildcard/multi-path/column-path forms are evaluated here in
Python and exposed as Arrow-batched pandas UDFs — the JSON docs in
these workloads are small per-row strings, and the evaluation is pure
per-row string work no Spark builtin expresses.

Path arguments arrive JSON-encoded (``to_json(array(p1, p2, ...))``)
so a single stable UDF signature covers every arity, and NULL paths
survive the trip (MySQL: any NULL path argument nulls the result).
"""

# NOTE: no `from __future__ import annotations` here — stringified
# annotations break pandas_udf's type-hint inference (UNSUPPORTED_SIGNATURE)
import json


# --- path grammar -------------------------------------------------------------


def parse_path(p: str) -> list[tuple]:
    """MySQL path string -> list of legs:
    ('member', name) | ('member_all',) | ('index', n) | ('index_all',)
    | ('descend',). Raises ValueError on malformed paths (MySQL errors
    3143 'Invalid JSON path expression')."""
    s = p.strip()
    if not s.startswith("$"):
        raise ValueError(f"bad path {p!r}")
    i, legs = 1, []
    while i < len(s):
        c = s[i]
        if c.isspace():
            i += 1
        elif s.startswith("**", i):
            legs.append(("descend",))
            i += 2
            if i >= len(s):
                raise ValueError(f"path may not end with ** ({p!r})")
        elif c == ".":
            i += 1
            while i < len(s) and s[i].isspace():
                i += 1
            if i >= len(s):
                raise ValueError(f"bad path {p!r}")
            if s[i] == "*":
                legs.append(("member_all",))
                i += 1
            elif s[i] == '"':
                j = i + 1
                buf = []
                while j < len(s) and s[j] != '"':
                    if s[j] == "\\" and j + 1 < len(s):
                        buf.append(s[j + 1])
                        j += 2
                        continue
                    buf.append(s[j])
                    j += 1
                if j >= len(s):
                    raise ValueError(f"unterminated quoted member in {p!r}")
                legs.append(("member", "".join(buf)))
                i = j + 1
            else:
                j = i
                while j < len(s) and (s[j].isalnum() or s[j] in "_$"):
                    j += 1
                if j == i:
                    raise ValueError(f"bad member in {p!r}")
                legs.append(("member", s[i:j]))
                i = j
        elif c == "[":
            j = s.find("]", i)
            if j < 0:
                raise ValueError(f"unterminated [ in {p!r}")
            tok = s[i + 1:j].strip()
            if tok == "*":
                legs.append(("index_all",))
            else:
                legs.append(("index", int(tok)))
            i = j + 1
        else:
            raise ValueError(f"bad path {p!r}")
    return legs


def eval_path(v, legs: list[tuple]) -> list:
    """All values the path matches in ``v``, document order."""
    if not legs:
        return [v]
    leg, rest = legs[0], legs[1:]
    kind = leg[0]
    out: list = []
    if kind == "member":
        if isinstance(v, dict) and leg[1] in v:
            out += eval_path(v[leg[1]], rest)
    elif kind == "member_all":
        if isinstance(v, dict):
            for x in v.values():
                out += eval_path(x, rest)
    elif kind == "index":
        if isinstance(v, list):
            if 0 <= leg[1] < len(v):
                out += eval_path(v[leg[1]], rest)
        elif leg[1] == 0:
            # MySQL autowrap: a non-array value is [value] for $[0]
            out += eval_path(v, rest)
    elif kind == "index_all":
        if isinstance(v, list):
            for x in v:
                out += eval_path(x, rest)
    elif kind == "descend":
        out += _eval_descend(v, rest)
    return out


def _eval_descend(v, rest: list[tuple]) -> list:
    # prefix**suffix: the suffix may match at any depth, including
    # directly at the prefix's value (MySQL: $**.a on {"a":"b"} -> ["b"])
    out = eval_path(v, rest)
    if isinstance(v, dict):
        for x in v.values():
            out += _eval_descend(x, rest)
    elif isinstance(v, list):
        for x in v:
            out += _eval_descend(x, rest)
    return out


def render(v) -> str:
    """MySQL's JSON rendering (', ' / ': ' separators, no ASCII escape)."""
    return json.dumps(v, separators=(", ", ": "), ensure_ascii=False)


# --- function semantics (pure Python, one row) ---------------------------------


def json_extract_py(doc: str | None, paths: list[str | None]) -> str | None:
    if doc is None or not paths or any(p is None for p in paths):
        return None
    try:
        v = json.loads(doc)
    except ValueError:
        return None
    legs_list = [parse_path(p) for p in paths]
    matches: list = []
    for legs in legs_list:
        matches += eval_path(v, legs)
    if not matches:
        return None
    multi = len(paths) > 1 or any(
        leg[0] in ("member_all", "index_all", "descend")
        for leg in legs_list[0]
    )
    return render(matches if multi else matches[0])


def json_keys_py(doc: str | None, path: str | None) -> str | None:
    if doc is None or path is None:
        return None
    try:
        v = json.loads(doc)
    except ValueError:
        return None
    m = eval_path(v, parse_path(path))
    if not m or not isinstance(m[0], dict):
        return None
    return render(list(m[0].keys()))


def json_contains_path_py(
    doc: str | None, one_or_all: str | None, paths: list[str | None]
) -> int | None:
    """MySQL's short-circuit NULL rule (pinned by the reference's
    json_contains_path.test full cross-join): paths scan in order; 'one'
    returns 1 at the first match, 'all' returns 0 at the first miss —
    BEFORE a later NULL path can null the result; a NULL path reached
    first nulls it."""
    if doc is None or one_or_all is None:
        return None
    mode = one_or_all.lower()
    if mode not in ("one", "all"):
        raise ValueError(f"json_contains_path mode {one_or_all!r}")
    try:
        v = json.loads(doc)
    except ValueError:
        return None
    for p in paths:
        if p is None:
            return None
        hit = bool(eval_path(v, parse_path(p)))
        if mode == "one" and hit:
            return 1
        if mode == "all" and not hit:
            return 0
    return 1 if mode == "all" else 0


# --- Spark registration ---------------------------------------------------------


def register_json_udfs(spark) -> list[str]:
    """Register the Arrow-batched UDFs on the session; returns names."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _paths(cell: str | None) -> list[str | None]:
        return json.loads(cell) if cell is not None else [None]

    @pandas_udf("string")
    def _jext(doc: pd.Series, paths: pd.Series) -> pd.Series:
        return pd.Series(
            [
                json_extract_py(
                    None if d is None else str(d), _paths(ps)
                )
                for d, ps in zip(doc, paths)
            ],
            dtype=object,
        )

    @pandas_udf("string")
    def _jkeys(doc: pd.Series, path: pd.Series) -> pd.Series:
        return pd.Series(
            [
                json_keys_py(
                    None if d is None else str(d),
                    None if p is None else str(p),
                )
                for d, p in zip(doc, path)
            ],
            dtype=object,
        )

    @pandas_udf("int")
    def _jcp(doc: pd.Series, mode: pd.Series, paths: pd.Series) -> pd.Series:
        return pd.Series(
            [
                json_contains_path_py(
                    None if d is None else str(d),
                    None if m is None else str(m),
                    _paths(ps),
                )
                for d, m, ps in zip(doc, mode, paths)
            ],
            dtype="Int32",
        )

    @pandas_udf("string")
    def _jcast(doc: pd.Series) -> pd.Series:
        return pd.Series(
            [cast_json_py(None if d is None else str(d)) for d in doc],
            dtype=object,
        )

    spark.udf.register("mysql_json_extract", _jext)
    spark.udf.register("mysql_json_keys", _jkeys)
    spark.udf.register("mysql_json_contains_path", _jcp)
    spark.udf.register("mysql_cast_json", _jcast)
    return ["mysql_json_extract", "mysql_json_keys",
            "mysql_json_contains_path", "mysql_cast_json"]


def mysql_json_render(v) -> str:
    """MySQL's canonical JSON text: ', ' and ': ' separators, object
    keys sorted by (length, bytes) — the binary-JSON key order
    (reference dbms/src/TiDB/Decode/JsonBinary.cpp) — doubles keep a
    fraction digit (0 -> 0.0), strings/escapes via json.dumps."""
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            return "null"
        return f"{v:.1f}" if v.is_integer() else repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, list):
        return "[" + ", ".join(mysql_json_render(x) for x in v) + "]"
    if isinstance(v, dict):
        keys = sorted(v, key=lambda k: (len(k.encode()), k.encode()))
        return "{" + ", ".join(
            f"{json.dumps(k, ensure_ascii=False)}: {mysql_json_render(v[k])}"
            for k in keys
        ) + "}"
    return json.dumps(v, ensure_ascii=False)


def cast_json_py(s):
    """CAST(string AS JSON): parse, re-render canonically; invalid JSON
    is NULL on this non-strict surface (MySQL errors — the reference
    script's Invalid blocks are {#REGEXP}-unchecked)."""
    if s is None:
        return None
    try:
        return mysql_json_render(json.loads(s))
    except (ValueError, RecursionError):
        return None


# --- other per-row MySQL string functions ---------------------------------------


def substring_index_py(s, d, n):
    """MySQL SUBSTRING_INDEX: non-overlapping scan, from the LEFT for
    positive counts and from the RIGHT for negative ones — overlap
    behavior differs from Spark's builtin on repeated-delimiter runs
    ('www......pingcap....com', '..', -2 is '..com', not '.com';
    expr/substring_index.test)."""
    if s is None or d is None or n is None:
        return None
    if d == "" or n == 0:
        return ""
    if n > 0:
        idx, start, count = -1, 0, 0
        while count < n:
            idx = s.find(d, start)
            if idx < 0:
                return s
            start = idx + len(d)
            count += 1
        return s[:idx]
    n = -n
    end, count, pos = len(s), 0, None
    while count < n:
        idx = s.rfind(d, 0, end)
        if idx < 0:
            return s
        pos = idx
        end = idx
        count += 1
    return s[pos + len(d):]


def register_string_udfs(spark) -> list[str]:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _ssi(s: pd.Series, d: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series(
            [
                substring_index_py(
                    None if a is None else str(a),
                    None if b is None else str(b),
                    None if c is None or c != c else int(c),
                )
                for a, b, c in zip(s, d, n)
            ],
            dtype=object,
        )

    spark.udf.register("mysql_substring_index", _ssi)
    return ["mysql_substring_index"]
