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
  | (?P<op>==|!=|<=|>=|<>|::|[-+*/%(),;:=<>\[\]{}.])
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


def _is_raw_sql(cur: list[Token]) -> bool:
    if not cur:
        return False
    first = cur[0]
    if first.upper in ("SELECT", "WITH"):
        return True
    # assignment whose RHS is raw SQL: x = SELECT …
    if len(cur) >= 3 and cur[1].value == "=" and cur[2].upper in ("SELECT", "WITH"):
        return True
    return False


def _is_boundary(tokens: list[Token], i: int, cur: list[Token]) -> bool:
    """Does a new statement start at token i? (i is at a line start)"""
    t = tokens[i]
    if t.kind == "word" and t.upper in STATEMENT_KEYWORDS:
        # "UNION\nSELECT …" continues the current raw-SQL statement
        if cur and cur[-1].upper in _SQL_CONTINUATORS:
            return False
        return True
    if _is_raw_sql(cur):
        return False  # inside SQL, `a = 5` on a new line is not an assignment
    # assignment: IDENT = (not ==)
    if (
        t.kind == "word"
        and i + 1 < len(tokens)
        and tokens[i + 1].value == "="
        and (i + 2 >= len(tokens) or tokens[i + 2].value != "=")
    ):
        return True
    return False


def split_statements(text: str) -> list[list[Token]]:
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
        if cur and depth == 0 and at_line_start and _is_boundary(tokens, i, cur):
            stmts.append(cur)
            cur = []
        cur.append(t)
        prev_line = t.line
    if cur:
        stmts.append(cur)
    return stmts
