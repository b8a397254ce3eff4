"""Run the reference's own fullstack ``.test`` scripts, verbatim, against
the SQL surface (sources/admin_sql.run_sql + the DeltaStore engine).

The reference drives every end-to-end test through mysql-client scripts
(``tests/fullstack-test*/**/*.test``) executed by ``tests/run-test.py``:
``mysql>``-prefixed statements, followed (for queries) by the expected
result rendered as an ASCII table. This module parses that grammar and
replays the scripts here — the statements are NOT copied into this repo;
they are read from the reference tree at run time and skipped when it is
absent.

Comparison mirrors ``run-test.py``'s ``MySQLCompare`` exactly where it
matters (tests/run-test.py:220-251): each table line is split on ``|``,
cells are whitespace-stripped, empty cells are dropped, and rows are
compared as an unordered multiset. On top of that, cells are compared by
*value*, not rendering — ``1.00`` equals ``1.0``, ``2020-01-01
00:00:00.000000`` equals ``2020-01-01 00:00:00`` — because this engine's
display layer (Spark) is not MySQL's. Column header names are checked
for arity only, not spelling (Spark's auto-generated names differ, e.g.
``(b + 1)`` vs ``b + 1``; scripts that care alias explicitly).

Statement shims (each a session-environment difference, not a semantic
one):
- ``set [session|global] ...`` statements are dropped: engine selection
  (tidb_isolation_read_engines / tidb_enforce_mpp / tidb_allow_mpp) is
  vacuous here — this engine IS the columnar replica.
- ``alter table t set tiflash replica N`` and ``func> wait_table`` are
  no-ops: tables are replicated at write time.
- The ``test.`` schema qualifier is stripped; scripts use a single
  database.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import date, datetime, timedelta
from decimal import Decimal, InvalidOperation
from pathlib import Path

from pyspark.sql import SparkSession

REFERENCE_TESTS = Path("/root/reference/tests")

_MYSQL_PROMPT = "mysql> "
# the `mysql --binary-as-hex` client (run-test.py's CMD_PREFIX_TIDB_
# BINALY_AS_HEX): binary/bit values render as 0x.. hex
_MYSQL_HEX_PROMPT = "mysql_bin_as_hex> "
_FUNC_PROMPT = "func> "
_SLEEP_PROMPT = "SLEEP "
_REGEXP_MARK = "{#REGEXP}"


@dataclass
class Step:
    sql: str
    lineno: int
    expected: list[list[str]] | None = None  # parsed data rows (header dropped)
    expected_ncols: int | None = None
    unchecked: bool = False  # expected block used {#REGEXP} → execute only
    expect_error: bool = False  # expected block was an ERROR line
    bin_as_hex: bool = False  # mysql_bin_as_hex> prompt (0x.. rendering)


@dataclass
class ScriptResult:
    path: str
    steps_run: int = 0
    checked: int = 0
    unchecked: int = 0
    mismatches: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.mismatches


def _split_statements(line: str) -> list[str]:
    """Split a mysql> line into ';'-separated statements, quote-aware."""
    parts: list[str] = []
    buf: list[str] = []
    q: str | None = None
    i = 0
    while i < len(line):
        ch = line[i]
        if q:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(line):
                buf.append(line[i + 1])
                i += 2
                continue
            if ch == q:
                q = None
        elif ch in ("'", '"', "`"):
            q = ch
            buf.append(ch)
        elif ch == ";":
            s = "".join(buf).strip()
            if s:
                parts.append(s)
            buf = []
        else:
            buf.append(ch)
        i += 1
    s = "".join(buf).strip()
    if s:
        parts.append(s)
    return parts


def _parse_table_line(line: str) -> list[str]:
    # run-test.py:220-222 — strip cells, drop empties
    return [w.strip() for w in line.split("|") if w.strip() != ""]


def _finalize_block(step: Step, block: list[str]) -> None:
    """Attach an expected-output block to its statement. The mysql client
    has two renderings: bordered tables (interactive) and tab-separated
    plain rows (batch, e.g. expr/hex_str.test); ERROR lines mean the
    statement must fail; {#REGEXP} lines make the block fuzzy (executed,
    not value-checked)."""
    if not block:
        return
    if any(_REGEXP_MARK in ln for ln in block):
        step.unchecked = True
        return
    if re.match(r"^ERROR \d+", block[0]):
        step.expect_error = True
        return
    if any(ln.lstrip().startswith(("|", "+")) for ln in block):
        # bordered tables; a multi-statement line concatenates SEVERAL
        # (border, header, border, data..., border) renderings
        # (mpp/extra_physical_table_column.test) — segment on borders so
        # later tables' headers never count as data
        data: list[list[str]] = []
        ncols: set[int] = set()
        borders = 0
        seen_header = False
        for ln in block:
            s = ln.lstrip()
            if s.startswith("+"):
                borders += 1  # 1: before header, 2: before data, 3: done
                seen_header = False
                if borders == 3:
                    borders = 0
                continue
            if not s.startswith("|"):
                continue
            if borders == 1 and not seen_header:
                # header row; hand-edited blocks sometimes omit the
                # header/data separator (ddl/alter_create_table_from_
                # multi_regions.test) — later rows are then DATA
                ncols.add(len(ln.split("|")) - 2)
                seen_header = True
                continue
            data.append(_parse_table_line(ln))
        step.expected = [r for r in data if r]
        step.expected_ncols = ncols.pop() if len(ncols) == 1 else None
    else:
        header, *data = block
        step.expected_ncols = len(header.split("\t"))
        step.expected = [
            [w.strip() for w in ln.split("\t") if w.strip() != ""]
            for ln in data
        ]
        step.expected = [r for r in step.expected if r]


def _read_source_file(rel: str) -> list[str]:
    """Statements of a `source`d .sql file (read from the reference tree
    at run time, like the scripts themselves — never vendored). `--`
    line comments dropped; statements split on top-level `;` so
    multi-line CREATEs and CTE queries stay whole."""
    p = REFERENCE_TESTS / rel
    if not p.exists():
        raise FileNotFoundError(f"source file not found: {rel}")
    lines = [
        ln for ln in p.read_text().splitlines()
        if not ln.lstrip().startswith("--")
    ]
    # flatten to one line per statement: the SQL-surface regexes are
    # line-oriented (none of the sourced files carry literal newlines
    # inside string constants)
    return [
        re.sub(r"\s*\n\s*", " ", s).strip()
        for s in _split_statements("\n".join(lines))
    ]


def parse_script(path: str | Path) -> list[Step]:
    steps: list[Step] = []
    pending: Step | None = None
    block: list[str] = []

    def flush() -> None:
        nonlocal pending, block
        if pending is not None:
            _finalize_block(pending, block)
        pending, block = None, []

    for lineno, raw in enumerate(Path(path).read_text().splitlines(), 1):
        line = raw.rstrip("\n")
        if line.startswith((_MYSQL_PROMPT, _MYSQL_HEX_PROMPT)):
            flush()
            as_hex = line.startswith(_MYSQL_HEX_PROMPT)
            body = line[
                len(_MYSQL_HEX_PROMPT if as_hex else _MYSQL_PROMPT):
            ]
            # trailing directive comments (#NO_UNESCAPE) — the unescape
            # concern is the mysql client's, not ours
            body = re.sub(r"\s+#\w+\s*$", "", body)
            srcm = re.match(r"(?i)^\s*source\s+(\S+?);?\s*$", body)
            if srcm:
                # the mysql client's `source <file.sql>` directive
                # (rollup_tpcds.test preloads the tpcds_util schema):
                # inline the file's statements; paths are relative to the
                # reference's tests/ dir (run-test.py's working dir)
                for stmt in _read_source_file(srcm.group(1)):
                    if (re.match(r"(?i)^set\s", stmt) and not _SET_TZ.match(stmt)
                            and not _SET_TRACKED_VAR.search(stmt)):
                        continue
                    steps.append(Step(sql=stmt, lineno=lineno))
                    pending = steps[-1]
                continue
            for stmt in _split_statements(body):
                if (re.match(r"(?i)^set\s", stmt) and not _SET_TZ.match(stmt)
                            and not _SET_TRACKED_VAR.search(stmt)):
                    continue  # session vars — see module docstring
                steps.append(Step(sql=stmt, lineno=lineno, bin_as_hex=as_hex))
                pending = steps[-1]
            continue
        if (
            line.startswith(_FUNC_PROMPT)
            or line.startswith(_SLEEP_PROMPT)
            or line.startswith("=> ")  # DBGInvoke debug interface — not
            or line.startswith(">> ")  # part of the SQL surface
            or line.startswith("curl>")
        ):
            # fail-point toggles ARE replayed (the reference's failure-
            # injection surface; mpp-version.test rejects dispatch while
            # invalid_mpp_version is armed) — other DBGInvokes are
            # environment plumbing
            fpm = re.match(
                r"^(?:=>|>>)\s+DBGInvoke\s+__(enable|disable)_fail_point"
                r"\(\s*(\w+)\s*\)", line
            )
            flush()
            if fpm:
                steps.append(Step(
                    sql=f"__failpoint_{fpm.group(1)}__ {fpm.group(2)}",
                    lineno=lineno,
                ))
            continue
        if not line.strip():
            # a blank line between a statement and its expected table
            # (expr/is_true_false.test) does not end the step; a blank
            # line after a BORDERED table does. In the tab-separated
            # batch rendering a blank line is an EMPTY-string result row
            # (expr/substring_index.test's '' rows) — the block continues
            # to the next prompt, and the empty row drops like any other
            # all-empty cells row.
            if block and any(
                ln.lstrip().startswith(("+", "|")) for ln in block
            ):
                flush()
            continue
        if line.startswith("#") and _REGEXP_MARK not in line:
            continue
        if (
            pending is not None
            and not block
            and line[:1] in (" ", "\t")
            and not line.lstrip().startswith(("+", "|"))
            and steps
            and steps[-1] is pending
        ):
            # indented continuation of a multi-line statement
            # (expr/json_object.test's VALUES rows)
            cont = re.sub(r"\s+#\w+\s*$", "", line.strip()).rstrip(";")
            pending.sql = pending.sql.rstrip(";") + " " + cont
            continue
        if pending is not None:
            block.append(line)
    flush()
    return steps


# --- value canonicalization -------------------------------------------------

_DT_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?$")
_DATE_RE = re.compile(r"^\d{4}-\d{2}-\d{2}$")
_NUM_RE = re.compile(r"^-?(\d+(\.\d*)?|\.\d+)([eE][-+]?\d+)?$")
# a TIME/duration rendering ('700:10:10.1235'): display precision varies
# by declared fsp — compare by VALUE (MySQL shows '.123500' where the
# canonical-minimal storage keeps '.1235')
_DUR_RE = re.compile(r"^(-?)(\d{2,3}):(\d{2}):(\d{2})(\.\d+)?$")


def _canon_cell(cell: str):
    if cell == "NULL":
        return ("null",)
    dm = _DUR_RE.match(cell)
    if dm:
        sign = -1 if dm.group(1) else 1
        total = (
            int(dm.group(2)) * 3600
            + int(dm.group(3)) * 60
            + int(dm.group(4))
        )
        frac = Decimal(dm.group(5) or "0")
        return ("dur", sign * (Decimal(total) + frac).normalize())
    if _DT_RE.match(cell):
        # a midnight datetime unifies with its date: MySQL displays
        # DATE-typed results without a time part, this engine's
        # TIMESTAMP-backed columns with one
        try:
            d = datetime.fromisoformat(cell.replace(" ", "T"))
        except ValueError:  # zero dates ('0000-00-00 ...') stay strings
            return ("str", cell)
        return ("dt", d.date()) if d.time() == d.min.time() else ("dt", d)
    if _DATE_RE.match(cell):
        try:
            return ("dt", date.fromisoformat(cell))
        except ValueError:  # '0000-00-00'
            return ("str", cell)
    if cell[:1] in "[{":
        # JSON renderings differ in whitespace ("[1, 2]" vs "[1,2]") —
        # compare parsed
        try:
            import json

            return ("json", json.dumps(json.loads(cell), sort_keys=True))
        except ValueError:
            pass
    if _NUM_RE.match(cell):
        try:
            d = Decimal(cell)
            # floats round-trip through %.10g so display-precision noise
            # (0.30000000000000004 vs 0.3) compares equal
            return ("num", Decimal(f"{d:.10g}").normalize())
        except InvalidOperation:
            pass
    return ("str", cell)


def _format_value(v) -> str:
    """Render one result value the way the mysql client would."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, float):
        # MySQL's math never yields NaN/Inf — sqrt(-1), log(-1) etc. are
        # NULL where IEEE Spark says NaN
        if v != v or v in (float("inf"), float("-inf")):
            return "NULL"
        return f"{v:.10g}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f") if v.microsecond else v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, (bytes, bytearray)):
        v = v.decode("utf-8", "backslashreplace")
    if isinstance(v, (list, tuple)):
        # VECTOR columns (array<float>) widen to Python doubles at
        # collect — render elements at float32 precision when they
        # round-trip (TiDB prints '1.4', not 1.399999976)
        import numpy as np

        def elem(x):
            if isinstance(x, float) and float(np.float32(x)) == x:
                return repr(np.float32(x)).rstrip(")").split("(")[-1]
            return _format_value(x)

        return "[" + ", ".join(elem(x) for x in v) + "]"
    if isinstance(v, str):
        # the expected blocks come from the mysql client's batch output,
        # which escapes specials (run-test.py pipes `mysql -e`): emulate
        return (
            v.replace("\\", "\\\\")
            .replace("\n", "\\n")
            .replace("\t", "\\t")
            .replace("\0", "\\0")
        )
    return str(v)


def _canon_rows(rows: list[list[str]]):
    from collections import Counter

    return Counter(tuple(_canon_cell(c) for c in row) for row in rows)


# --- execution --------------------------------------------------------------

_TIFLASH_REPLICA = re.compile(
    r"(?i)^alter\s+table\s+\S+\s+set\s+tiflash\s+replica\s+\d+"
)
# `set time_zone = '+8:00'` is the one session variable with result
# semantics (timestamp rendering) — mapped onto Spark's session timezone
# session vars run_sql tracks (group_concat_max_len, div_precision_
# increment) pass through to the engine instead of being stripped
import tiflash_spark.sources.admin_sql as _adm_vars
_SET_TRACKED_VAR = re.compile(
    r"(?i)\b(" + "|".join(_adm_vars._TRACKED_VARS) + r")\s*="
)
_SET_TZ = re.compile(
    r"(?i)^set\s+(?:session\s+|@@(?:session\.)?)?time_zone\s*=\s*"
    r"'(?P<tz>[^']+)'\s*$"
)
# statements about cluster topology / session bookkeeping with no
# analytic semantics here: region splits, database selection (scripts
# use a single schema, already stripped), warning inspection
_NOOP_STMT = re.compile(
    r"(?i)^(use\s+\w+|split\s+table\b.*|admin\s+check\b.*"
    # autocommit writes: txns are no-ops here
    r"|begin(\s+(pessimistic|optimistic))?|commit|rollback)$"
)
_ANALYZE = re.compile(r"(?i)^analyze\s+table\s")
_TEST_SCHEMA = re.compile(r"(?i)\btest\.(?=`?\w)")


def run_script(
    spark: SparkSession,
    path: str | Path,
    base_path: str,
) -> ScriptResult:
    """Replay one .test script; returns per-step value-compare results."""
    from tiflash_spark.sources.admin_sql import run_sql

    res = ScriptResult(path=str(path))
    stores: dict = {}
    from tiflash_spark.sources import admin_sql as _adm

    _adm.SESSION_VARS.clear()  # script-scoped session variables
    _adm.GLOBAL_VARS.clear()
    _adm._FAST_VIEWS.clear()
    _adm.DROPPED_TABLES.clear()  # script-scoped FLASHBACK retention
    # MySQL evaluates non-strictly in SELECT: overflowing casts clamp,
    # bad parses yield 0/NULL, x/0 is NULL. That is Spark's non-ANSI
    # dialect, so the replay runs with ANSI off (Spark 4 defaults on)
    # and restores the session conf afterwards.
    prev_ansi = spark.conf.get("spark.sql.ansi.enabled", None)
    prev_tz = spark.conf.get("spark.sql.session.timeZone", None)
    prev_excl = spark.conf.get("spark.sql.optimizer.excludedRules", None)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # FoldablePropagation mis-validates the typeof()-dispatched AVG/ROUND
    # shapes under ROLLUP (PLAN_VALIDATION_FAILED_RULE_IN_BATCH) — a
    # correctness-neutral optimization, excluded for the replay only
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.FoldablePropagation",
    )
    prev_rec = spark.conf.get("spark.sql.cteRecursionLevelLimit", None)
    # issue_10809's WITH RECURSIVE seq builds 128 levels; default cap 100
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "10000")
    try:
        _run_steps(spark, run_sql, path, stores, base_path, res)
    finally:
        for key, prev in (
            ("spark.sql.ansi.enabled", prev_ansi),
            ("spark.sql.session.timeZone", prev_tz),
            ("spark.sql.optimizer.excludedRules", prev_excl),
            ("spark.sql.cteRecursionLevelLimit", prev_rec),
        ):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
    return res


def _tz_offset(zone: str, at: datetime) -> timedelta:
    """UTC offset of a MySQL @@time_zone value at the given instant."""
    if zone.upper() in ("SYSTEM", "UTC"):
        return timedelta(0)
    if zone[:1] in "+-":
        hh, _, mm = zone[1:].partition(":")
        off = timedelta(hours=int(hh), minutes=int(mm or 0))
        return -off if zone[0] == "-" else off
    try:
        from datetime import timezone as _tzu
        from zoneinfo import ZoneInfo

        return ZoneInfo(zone).utcoffset(at.replace(tzinfo=_tzu.utc)) or timedelta(0)
    except Exception:  # unknown zone name — render unshifted
        return timedelta(0)


_CREATE_DB = re.compile(
    r"(?i)^\s*CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(?P<db>\w+)`?\s*$"
)
_DROP_DB = re.compile(
    r"(?i)^\s*DROP\s+DATABASE\s+(?:IF\s+EXISTS\s+)?`?(?P<db>\w+)`?\s*$"
)


def _run_steps(spark, run_sql, path, stores, base_path, res) -> None:
    from tiflash_spark.sources import admin_sql as _adm

    tz_zone = "UTC"
    # non-test databases are namespaced by mangling `db.t` -> `db__t`
    # (issue_10663 creates the SAME table name in two databases)
    dbs: set[str] = set()
    failpoints: set[str] = set()  # armed DBGInvoke fail points

    steps = parse_script(path)
    i = 0
    while i < len(steps):
        # one mysql> line = one comparison group: the client concatenates
        # the outputs of every statement on the line, and the expected
        # block (attached to the line's last statement) covers them all
        j = i
        while j < len(steps) and steps[j].lineno == steps[i].lineno:
            j += 1
        group = steps[i:j]
        i = j
        if tz_zone != "UTC":
            # every mysql> line is a FRESH client in run-test.py — a
            # `set time_zone` only reaches statements on its own line
            # (expr/unixTimeStamp.test reads at the default zone right
            # after a +1:00 line)
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            tz_zone = "UTC"
        # same fresh-client rule for tracked session vars: the new
        # session inherits current GLOBALs (set_variable_fastscan.test)
        _adm.SESSION_VARS.clear()
        _adm.SESSION_VARS.update(_adm.GLOBAL_VARS)
        last = group[-1]
        loc = f"{Path(path).name}:{last.lineno}"
        got: list[list[str]] = []
        out_ncols: set[int] = set()
        failed = False
        executed = False
        for step in group:
            sql = _TEST_SCHEMA.sub("", step.sql)
            dbm = _CREATE_DB.match(sql) or _DROP_DB.match(sql)
            if dbm:
                db = dbm.group("db")
                if db == "test":
                    continue
                if _CREATE_DB.match(sql):
                    dbs.add(db)
                else:
                    for t in [t for t in list(stores or {}) if t.startswith(f"{db}__")]:
                        try:
                            run_sql(spark, f"DROP TABLE {t}", stores, base_path=base_path)
                        except Exception:  # noqa: BLE001
                            pass
                continue
            fbm = re.match(
                r"(?i)^\s*flashback\s+database\s+`?(\w+)`?"
                r"(?:\s+to\s+`?(\w+)`?)?", sql)
            if fbm:
                # the restored database's qualifier must rewrite like a
                # created one (d1_new.t3 -> d1_new__t3)
                dbs.add(fbm.group(1))
                dbs.add(fbm.group(2) or fbm.group(1))
            for db in dbs:
                if f"{db}." in sql:
                    sql = re.sub(rf"(?i)\b{db}\.(?=`?\w)", f"{db}__", sql)
            if _TIFLASH_REPLICA.match(sql):
                # route through run_sql: the statement records LOCATION
                # LABELS for information_schema.tiflash_replica
                try:
                    run_sql(spark, sql, stores, base_path=base_path)
                except Exception:  # noqa: BLE001 — replica DDL is advisory
                    pass
                continue
            if _ANALYZE.match(sql):
                continue
            tzm = _SET_TZ.match(sql)
            if tzm:
                tz = tzm.group("tz")
                spark.conf.set(
                    "spark.sql.session.timeZone",
                    "UTC" if tz.upper() == "SYSTEM" else f"GMT{tz}"
                    if tz[:1] in "+-" else tz,
                )
                # collect() renders tz-aware timestamps in the
                # PYTHON-local zone (UTC in this container), not the
                # session zone — track the session zone so results
                # display MySQL-style. Naive (TIMESTAMP_NTZ / MySQL
                # DATETIME) columns never shift.
                tz_zone = tz
                continue
            fpt = re.match(r"^__failpoint_(enable|disable)__ (\w+)$", sql)
            if fpt:
                (failpoints.add if fpt.group(1) == "enable"
                 else failpoints.discard)(fpt.group(2))
                continue
            if _NOOP_STMT.match(sql):
                continue
            executed = True
            try:
                aborting = failpoints & {
                    # fail points that abort every query dispatch while
                    # armed (mpp-version.test, fault-inject/mpp_hang)
                    "invalid_mpp_version", "hang_in_execution",
                }
                if aborting and re.match(r"(?i)\s*(select|with)\b", sql):
                    raise RuntimeError(
                        "MPP Task canceled because it seems hangs"
                        if "hang_in_execution" in aborting else
                        "Invalid mpp version -1, TiFlash expects version:"
                        " min 0, max 3, should upgrade TiDB/planner"
                    )
                df = run_sql(spark, sql, stores, base_path=base_path)
            except Exception as e:  # noqa: BLE001 — reported, not swallowed
                if last.expect_error:
                    res.checked += 1
                elif last.unchecked:
                    res.unchecked += 1
                else:
                    res.mismatches.append(
                        f"{loc}: {sql!r} raised {type(e).__name__}: {e}"
                    )
                failed = True
                break
            res.steps_run += 1
            if not re.match(
                r"(?i)\s*(select|show|desc|describe|explain|with)\b", sql
            ):
                continue  # the client prints nothing for DML/DDL
            if last.unchecked:
                continue
            try:
                rows = df.collect()
            except Exception as e:  # noqa: BLE001 — e.g. dates beyond Python's range
                try:
                    # year-0 dates ('0000-01-01', valid in MySQL and in
                    # Spark's proleptic calendar) have no Python
                    # datetime.date — re-collect rendered as strings
                    # (Spark's own cast renders them correctly)
                    from pyspark.sql import functions as _F

                    rows = df.select(
                        [_F.col(f"`{c}`").cast("string").alias(c)
                         for c in df.columns]
                    ).collect()
                except Exception:
                    res.mismatches.append(
                        f"{loc}: {sql!r} failed to materialize:"
                        f" {type(e).__name__}: {e}"
                    )
                    failed = True
                    break
            from pyspark.sql.types import FloatType, TimestampType

            tz_aware = [
                isinstance(f.dataType, TimestampType) for f in df.schema.fields
            ]
            # FLOAT columns widen to Python doubles at collect; MySQL
            # renders float32 at its shortest round-trip ('1.2', not
            # 1.200000048) — clustered_index/data_type.test
            is_f32 = [
                isinstance(f.dataType, FloatType) for f in df.schema.fields
            ]
            # --binary-as-hex rendering: BIT(n) ints print as 0x-hex at
            # the declared byte width, raw binary as its hex bytes
            # (ddl/alter_column_bit.test)
            hex_bits: list[int | None] = [None] * len(df.columns)
            if step.bin_as_hex:
                bitmap: dict[str, int] = {}
                for st in (stores or {}).values():
                    bitmap.update((st.table_def() or {}).get("bit_cols") or {})
                hex_bits = [bitmap.get(c) for c in df.columns]
            out_ncols.add(len(df.columns))

            def _cellv(k: int, v):
                if step.bin_as_hex:
                    if isinstance(v, (bytes, bytearray)):
                        return "0x" + bytes(v).hex().upper()
                    if hex_bits[k] and isinstance(v, int):
                        w = 2 * ((hex_bits[k] + 7) // 8)
                        return f"0x{v:0{w}X}"
                if isinstance(v, datetime) and tz_aware[k]:
                    return _format_value(v + _tz_offset(tz_zone, v))
                if (is_f32[k] and isinstance(v, float) and v == v
                        and v not in (float("inf"), float("-inf"))):
                    import numpy as np

                    return np.format_float_positional(
                        np.float32(v), unique=True, trim="-"
                    )
                return _format_value(v)

            for row in rows:
                cells = [_cellv(k, v) for k, v in enumerate(row)]
                # mirror the reference's empty-cell drop on the actual
                # side; rows reduced to nothing vanish on both sides
                cells = [c for c in (x.strip() for x in cells) if c != ""]
                if cells:
                    got.append(cells)
        if failed:
            continue
        if last.expect_error:
            res.mismatches.append(
                f"{loc}: {last.sql!r} succeeded, expected an error"
            )
            continue
        if last.unchecked:
            res.unchecked += 1
            continue
        if not executed:
            # the whole group was session noise (split table / replica /
            # analyze noops) — its expected block (e.g. split-region
            # counts) has no analytic meaning here
            if last.expected is not None:
                res.unchecked += 1
            continue
        if last.expected is None:
            if out_ncols:
                # output statements with no expected block: the client
                # printed nothing — results must be empty
                # (in_expression.test's "Expected to be Empty" checks)
                if got:
                    res.mismatches.append(
                        f"{loc}: {last.sql!r} returned {len(got)} rows,"
                        " expected empty"
                    )
                else:
                    res.checked += 1
            continue
        if (
            last.expected_ncols is not None
            and len(out_ncols) == 1
            and next(iter(out_ncols)) != last.expected_ncols
        ):
            res.mismatches.append(
                f"{loc}: {last.sql!r} returned {next(iter(out_ncols))} columns,"
                f" expected {last.expected_ncols}"
            )
            continue
        want_c, got_c = _canon_rows(last.expected), _canon_rows(got)
        if want_c != got_c:
            missing = list((want_c - got_c).elements())[:4]
            extra = list((got_c - want_c).elements())[:4]
            res.mismatches.append(
                f"{loc}: {last.sql!r} rows differ — missing {missing} extra {extra}"
            )
        else:
            res.checked += 1
