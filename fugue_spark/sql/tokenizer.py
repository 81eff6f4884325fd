"""Tokenizer for the FugueSQL-superset script language.

Splits a script into statements and statements into tokens. Statement
boundaries follow the reference grammar's shape (fugue-sql-antlr): a
statement starts at a line whose first token is a Fugue keyword or a
``var =`` assignment; raw-SQL statements (SELECT/WITH) swallow following
lines until the next such boundary. ``--`` comments and ``;`` separators
are honored.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

__all__ = ["tokenize", "split_statements", "Token"]

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*)
  | (?P<dqstring>"(?:[^"\\]|\\.)*")
  | (?P<sqstring>'(?:[^'\\]|\\.)*')
  | (?P<backtick>`(?:[^`]|``)*`)
  | (?P<number>\d+\.\d+|\.\d+|\d+)
  | (?P<op>==|!=|<=|>=|<>|::|[-+*/%(),;:=<>\[\]{}.~])
  | (?P<word>[A-Za-z_一-鿿][A-Za-z0-9_一-鿿]*)
    """,
    re.VERBOSE,
)

# keywords that may START a Fugue statement
STATEMENT_KEYWORDS = {
    "CREATE",
    "LOAD",
    "SAVE",
    "TRANSFORM",
    "OUTTRANSFORM",
    "PROCESS",
    "OUTPUT",
    "PRINT",
    "RENAME",
    "ALTER",
    "DROP",
    "FILL",
    "SAMPLE",
    "TAKE",
    "BROADCAST",
    "PERSIST",
    "CHECKPOINT",
    "DETERMINISTIC",
    "YIELD",
    "ZIP",
    "SELECT",
    "WITH",
    "CONNECT",
    "SUB",
    "MODULE",
}


@dataclass
class Token:
    value: str
    kind: str  # word | string | number | op
    line: int

    @property
    def upper(self) -> str:
        return self.value.upper()


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    line = 1
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise ValueError(f"cannot tokenize at line {line}: {text[pos:pos+30]!r}")
        line += text[pos : m.end()].count("\n")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind in ("dqstring", "sqstring"):
            out.append(Token(val, "string", line))
        elif kind == "backtick":
            out.append(Token(val, "word", line))
        elif kind == "number":
            out.append(Token(val, "number", line))
        elif kind == "word":
            out.append(Token(val, "word", line))
        else:
            out.append(Token(val, "op", line))
    return out


_SQL_CONTINUATORS = {"UNION", "ALL", "EXCEPT", "INTERSECT", "MINUS", "DISTINCT"}


def _is_kw(t: Token, kws: "set[str] | tuple[str, ...]", ignore_case: bool) -> bool:
    """Keyword test honoring the case mode: with ``ignore_case`` (the
    engine default) any casing matches, as under the reference's
    ``fsql_ignore_case=True`` (``/root/reference/fugue/sql/api.py:18-108``,
    conf ``fugue.sql.compile.ignore_case``); without it only EXACT-UPPERCASE
    tokens are keywords — the reference's strict default, which protects
    lowercase identifiers like a column named ``take`` at a line start from
    being read as statement starts."""
    return t.upper in kws and (ignore_case or t.value == t.upper)


def _is_raw_sql(cur: list[Token], ignore_case: bool = True) -> bool:
    if not cur:
        return False
    if _is_kw(cur[0], ("SELECT", "WITH"), ignore_case):
        return True
    # assignment whose RHS is raw SQL: x = SELECT …
    if (
        len(cur) >= 3
        and cur[1].value == "="
        and _is_kw(cur[2], ("SELECT", "WITH"), ignore_case)
    ):
        return True
    return False


def _is_boundary(
    tokens: list[Token], i: int, cur: list[Token], ignore_case: bool = True
) -> bool:
    """Does a new statement start at token i? (i is at a line start)"""
    t = tokens[i]
    if t.kind == "word" and _is_kw(t, STATEMENT_KEYWORDS, ignore_case):
        # "UNION\nSELECT …" continues the current raw-SQL statement
        if cur and _is_kw(cur[-1], _SQL_CONTINUATORS, ignore_case):
            return False
        # "WITH x AS (…)\nSELECT …" — the WITH statement's body select is
        # a continuation until the CTE list has its main SELECT
        if (
            _is_kw(t, ("SELECT",), ignore_case)
            and cur
            and _is_kw(cur[0], ("WITH",), ignore_case)
        ):
            depth = 0
            has_body = False
            for ct in cur[1:]:
                if ct.value in "([{":
                    depth += 1
                elif ct.value in ")]}":
                    depth -= 1
                elif depth == 0 and _is_kw(ct, ("SELECT",), ignore_case):
                    has_body = True
                    break
            if not has_body:
                return False
        return True
    # assignment: IDENT = <statement>  (the RHS must start with a statement
    # keyword — a labeled dataframe ref continuation line like
    # ``df1=(create using f),`` is NOT a new statement). Checked BEFORE the
    # raw-SQL continuation rule: ``x = SELECT …`` followed by
    # ``y = DROP ROWS …`` is two statements in the reference grammar, and
    # a keyword-RHS assignment at a line start can't be SQL text.
    if (
        t.kind == "word"
        and i + 2 < len(tokens)
        and tokens[i + 1].value == "="
        and tokens[i + 2].kind == "word"
        and _is_kw(tokens[i + 2], STATEMENT_KEYWORDS, ignore_case)
    ):
        return True
    if _is_raw_sql(cur, ignore_case):
        return False  # inside SQL, `a = 5` on a new line is not an assignment
    return False


def split_statements(text: str, ignore_case: bool = True) -> list[list[Token]]:
    tokens = tokenize(text)
    stmts: list[list[Token]] = []
    cur: list[Token] = []
    depth = 0
    prev_line = -1
    for i, t in enumerate(tokens):
        if t.value == ";" and depth == 0:
            if cur:
                stmts.append(cur)
                cur = []
            prev_line = -1
            continue
        if t.value in "([{":
            depth += 1
        elif t.value in ")]}":
            depth = max(0, depth - 1)
        at_line_start = t.line != prev_line
        if (
            cur
            and depth == 0
            and at_line_start
            and _is_boundary(tokens, i, cur, ignore_case)
        ):
            stmts.append(cur)
            cur = []
        cur.append(t)
        prev_line = t.line
    if cur:
        stmts.append(cur)
    return stmts
