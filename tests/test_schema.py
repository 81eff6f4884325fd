from __future__ import annotations

import pytest
from pyspark.sql import types as T

from fugue_spark.schema import (
    SchemaParseError,
    apply_schema_hint,
    is_schema_hint,
    parse_schema,
    parse_type,
    schema_to_string,
)


def test_primitives():
    s = parse_schema("a:int,b:str,c:double,d:bool,e:datetime,f:bytes,g:date,h:long")
    assert [f.dataType for f in s.fields] == [
        T.IntegerType(),
        T.StringType(),
        T.DoubleType(),
        T.BooleanType(),
        T.TimestampNTZType(),
        T.BinaryType(),
        T.DateType(),
        T.LongType(),
    ]
    assert all(f.nullable for f in s.fields)


def test_nested_types():
    s = parse_schema("a:[int],b:{x:long,y:[str]},c:<str,int>,d:[{a:int,b:[str]}]")
    assert s["a"].dataType == T.ArrayType(T.IntegerType(), True)
    assert s["b"].dataType == T.StructType(
        [
            T.StructField("x", T.LongType(), True),
            T.StructField("y", T.ArrayType(T.StringType(), True), True),
        ]
    )
    assert s["c"].dataType == T.MapType(T.StringType(), T.IntegerType(), True)
    assert isinstance(s["d"].dataType.elementType, T.StructType)


def test_decimal_and_roundtrip():
    s = parse_schema("a:decimal(10,2),b:<str,[int]>")
    assert s["a"].dataType == T.DecimalType(10, 2)
    assert parse_schema(schema_to_string(s)) == s


def test_roundtrip_simple():
    txt = "a:int,b:str,c:[double],d:{x:long},e:<str,int>"
    assert schema_to_string(parse_schema(txt)) == txt


def test_errors():
    for bad in ["", "a", "a:", ":int", "a:wat", "a:[int", "a:<int>"]:
        with pytest.raises((SchemaParseError, ValueError)):
            parse_schema(bad)


def test_idempotent_and_pairs():
    s = parse_schema("a:int")
    assert parse_schema(s) is s
    assert parse_schema([("a", "int"), ("b", "[str]")])["b"].dataType == T.ArrayType(
        T.StringType(), True
    )


def test_schema_hints():
    base = parse_schema("a:int,b:str,c:double")
    assert apply_schema_hint("*", base) == base
    assert schema_to_string(apply_schema_hint("*,d:long", base)) == "a:int,b:str,c:double,d:long"
    assert schema_to_string(apply_schema_hint("*-b", base)) == "a:int,c:double"
    assert schema_to_string(apply_schema_hint("*~b,z:int", base)) == "a:int,c:double,z:int"
    assert schema_to_string(apply_schema_hint("*~nope", base)) == "a:int,b:str,c:double"
    with pytest.raises(SchemaParseError):
        apply_schema_hint("*-nope", base)
    assert is_schema_hint("*,c:int")
    assert is_schema_hint("*")
    assert not is_schema_hint("a:int,b:str")
