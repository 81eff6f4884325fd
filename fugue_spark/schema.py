"""Compact schema-string syntax ⇄ ``pyspark.sql.types.StructType``.

The reference expresses every schema as a string like ``a:int,b:str``,
with ``[t]`` for arrays, ``{a:t}`` for structs and ``<k,v>`` for maps
(reference: fugue/sql/_visitors.py:139-165 parses the same grammar; the
type vocabulary follows triad's pyarrow-based naming). In this engine the
schema *is* a ``StructType``; the string form is only a convenience parser
plus the transform-hint DSL (``*``, ``*,new:int``, ``*-col``, ``*~maybe``).

All fields are nullable (the reference forces nullability on Spark fields,
fugue_spark/_utils/convert.py:246-288 — we keep that contract so pandas-UDF
round trips never fight the schema).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

__all__ = [
    "parse_schema",
    "schema_to_string",
    "parse_type",
    "type_to_string",
    "apply_schema_hint",
    "is_schema_hint",
]

_PRIMITIVES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "byte": T.ByteType(),
    "tinyint": T.ByteType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "int32": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "int64": T.LongType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "float32": T.FloatType(),
    "double": T.DoubleType(),
    "float64": T.DoubleType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    "bytes": T.BinaryType(),
    "binary": T.BinaryType(),
    "null": T.NullType(),
}

_DECIMAL_RE = re.compile(r"^decimal\((\d+)\s*,\s*(\d+)\)$")


class SchemaParseError(ValueError):
    pass


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` at bracket depth 0 (brackets: ``[] {} <> ()``)."""
    parts: list[str] = []
    depth = 0
    buf: list[str] = []
    opens, closes = "[{<(", "]}>)"
    for ch in s:
        if ch in opens:
            depth += 1
        elif ch in closes:
            depth -= 1
            if depth < 0:
                raise SchemaParseError(f"unbalanced brackets in {s!r}")
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if depth != 0:
        raise SchemaParseError(f"unbalanced brackets in {s!r}")
    parts.append("".join(buf))
    return parts


def parse_type(expr: str) -> T.DataType:
    """Parse one type expression (``int``, ``[str]``, ``{a:long}``, ``<str,int>``)."""
    expr = expr.strip()
    if not expr:
        raise SchemaParseError("empty type expression")
    if expr.startswith("[") and expr.endswith("]"):
        return T.ArrayType(parse_type(expr[1:-1]), containsNull=True)
    if expr.startswith("{") and expr.endswith("}"):
        return _parse_struct(expr[1:-1])
    if expr.startswith("<") and expr.endswith(">"):
        kv = _split_top(expr[1:-1])
        if len(kv) != 2:
            raise SchemaParseError(f"map type needs <key,value>: {expr!r}")
        return T.MapType(parse_type(kv[0]), parse_type(kv[1]), valueContainsNull=True)
    low = expr.lower()
    if low in _PRIMITIVES:
        return _PRIMITIVES[low]
    m = _DECIMAL_RE.match(low)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    raise SchemaParseError(f"unknown type {expr!r}")


def _parse_field(item: str) -> T.StructField:
    item = item.strip()
    idx = item.find(":")
    if idx <= 0:
        raise SchemaParseError(f"field must be name:type, got {item!r}")
    name = item[:idx].strip()
    if name.startswith("`") and name.endswith("`") and len(name) > 1:
        name = name[1:-1]
    if not name:
        raise SchemaParseError(f"empty field name in {item!r}")
    return T.StructField(name, parse_type(item[idx + 1 :]), nullable=True)


def _parse_struct(body: str) -> T.StructType:
    return T.StructType([_parse_field(p) for p in _split_top(body) if p.strip()])


def parse_schema(schema: "str | T.StructType | list[tuple[str, str]]") -> T.StructType:
    """Parse a compact schema string into a ``StructType`` (idempotent)."""
    if isinstance(schema, T.StructType):
        return schema
    if isinstance(schema, (list, tuple)):
        return T.StructType(
            [T.StructField(n, parse_type(t), True) for n, t in schema]
        )
    if not isinstance(schema, str) or not schema.strip():
        raise SchemaParseError(f"invalid schema {schema!r}")
    return _parse_struct(schema.strip())


def type_to_string(dt: T.DataType) -> str:
    """Inverse of :func:`parse_type` (canonical names)."""
    if isinstance(dt, T.ArrayType):
        return f"[{type_to_string(dt.elementType)}]"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{type_to_string(f.dataType)}" for f in dt.fields)
        return "{" + inner + "}"
    if isinstance(dt, T.MapType):
        return f"<{type_to_string(dt.keyType)},{type_to_string(dt.valueType)}>"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    names = {
        T.BooleanType: "bool",
        T.ByteType: "byte",
        T.ShortType: "short",
        T.IntegerType: "int",
        T.LongType: "long",
        T.FloatType: "float",
        T.DoubleType: "double",
        T.StringType: "str",
        T.DateType: "date",
        T.TimestampNTZType: "datetime",
        T.TimestampType: "datetime",
        T.BinaryType: "bytes",
        T.NullType: "null",
    }
    for cls, name in names.items():
        if isinstance(dt, cls):
            return name
    raise SchemaParseError(f"cannot render type {dt!r}")


def schema_to_string(schema: T.StructType) -> str:
    return ",".join(f"{f.name}:{type_to_string(f.dataType)}" for f in schema.fields)


def is_schema_hint(s: str) -> bool:
    """True when the string uses the wildcard/patch DSL (needs an input schema)."""
    return any(tok.strip() and tok.strip()[0] in "*+-~" for tok in _split_top(s))


def apply_schema_hint(hint: str, input_schema: T.StructType) -> T.StructType:
    """Resolve a transform schema hint against the input schema.

    Tokens (comma-separated at depth 0); each token may chain operator
    segments, e.g. ``*~k+AA:str`` = all input columns, minus ``k``, plus
    ``AA:str``:
      ``*``          all input columns (in order)
      ``name:type``  append a new column (or ``+name:type``)
      ``-name``      remove column (error if absent)
      ``~name``      remove column if present
    (reference DSL: fugue/sql/_visitors.py:125-137 visitFugueWildSchema →
    triad schema transformation expressions; ``+`` after a removal starts
    an addition, as in the reference's ``schema *~k+AA:str,bb:int``)
    """
    fields: list[T.StructField] = []
    removed: set[str] = set()
    saw_star = False
    tokens: list[str] = []
    for raw in _split_top(hint):
        tok = raw.strip()
        if not tok:
            continue
        # split chained operator segments at depth 0 (types never contain
        # + - ~ *, so only brace/bracket/paren depth and backtick-quoted
        # names — which may contain anything — need tracking)
        depth = 0
        in_bt = False
        seg_start = 0
        for i, ch in enumerate(tok):
            if ch == "`":
                in_bt = not in_bt
            elif in_bt:
                continue
            elif ch in "{[(":
                depth += 1
            elif ch in ")]}":
                depth -= 1
            elif ch in "+-~*" and depth == 0 and i > seg_start:
                tokens.append(tok[seg_start:i].strip())
                seg_start = i
            elif ch == "*" and depth == 0 and i == seg_start and len(tok) > 1:
                tokens.append("*")
                seg_start = i + 1
        if seg_start < len(tok):
            tokens.append(tok[seg_start:].strip())
    for tok in tokens:
        if not tok:
            continue
        if tok == "*":
            if saw_star:
                raise SchemaParseError("duplicate * in schema hint")
            saw_star = True
            fields.extend(input_schema.fields)
        elif tok.startswith("-") or tok.startswith("~"):
            optional = tok.startswith("~")
            name = tok[1:].strip()
            present = any(f.name == name for f in fields)
            if not present and not optional:
                raise SchemaParseError(f"cannot remove missing column {name!r}")
            removed.add(name)
        else:
            if tok.startswith("+"):
                tok = tok[1:]
            fields.append(_parse_field(tok))
    out = [f for f in fields if f.name not in removed]
    if not out:
        raise SchemaParseError(f"schema hint {hint!r} resolves to empty schema")
    return T.StructType(out)
