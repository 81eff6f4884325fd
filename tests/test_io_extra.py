from __future__ import annotations

import os

import pytest

import fugue_spark.api as fa
from fugue_spark.schema import parse_schema


def rows(df):
    return sorted([tuple(r) for r in df.collect()], key=lambda t: tuple(map(str, t)))


def test_load_glob_and_folder(spark, tmp_path):
    a = spark.createDataFrame([[1, "x"]], parse_schema("a:long,b:str"))
    b = spark.createDataFrame([[2, "y"]], parse_schema("a:long,b:str"))
    d1 = os.path.join(str(tmp_path), "part1.parquet")
    d2 = os.path.join(str(tmp_path), "part2.parquet")
    fa.save(a, d1)
    fa.save(b, d2)
    # glob over both datasets
    got = fa.load(spark, os.path.join(str(tmp_path), "part*.parquet"), format_hint="parquet")
    assert rows(got) == [(1, "x"), (2, "y")]
    # list of paths
    got = fa.load(spark, [d1, d2], format_hint="parquet")
    assert rows(got) == [(1, "x"), (2, "y")]


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "t.orc")
    fa.save(df, p)
    assert rows(fa.load(spark, p)) == [(1, "x"), (2, "y")]


def test_csv_no_header_with_schema(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "t.csv")
    fa.save(df, p, header=False)
    back = fa.load(spark, p, header=False, schema="a:long,b:str")
    assert rows(back) == [(1, "x")]
    with pytest.raises(ValueError):
        fa.load(spark, p, schema="a:long,b:str", infer_schema=True)


def test_json_single_file(spark, tmp_path):
    df = spark.createDataFrame([[1, "x"], [2, "y"]], parse_schema("a:long,b:str"))
    p = os.path.join(str(tmp_path), "single.json")
    fa.save(df, p, force_single=True)
    assert os.path.isfile(p)
    back = fa.load(spark, p, columns="a:long,b:str")
    assert rows(back) == [(1, "x"), (2, "y")]


# --- compact_dataset (small-files compaction) ---


def _mk_small_files(spark, path, n_parts=16):
    df = spark.range(0, 2000).selectExpr("id", "id % 3 AS lang", "repeat('x', 50) AS pad")
    df.repartition(n_parts).write.mode("overwrite").parquet(path)
    return df


def test_compact_reduces_file_count_losslessly(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset, dataset_file_stats

    src = str(tmp_path / "many.parquet")
    out = str(tmp_path / "compacted.parquet")
    _mk_small_files(spark, src, n_parts=16)
    assert dataset_file_stats(spark, src)["n_files"] == 16
    stats = compact_dataset(spark, src, out, target_file_bytes=1 << 30)
    assert stats["in_files"] == 16 and stats["out_files"] == 1
    assert stats["requested_files"] == 1
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in spark.read.parquet(out).collect())
    assert a == b


def test_compact_target_splits_into_multiple_files(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "many2.parquet")
    out = str(tmp_path / "split.parquet")
    _mk_small_files(spark, src, n_parts=16)
    total = compact_dataset(spark, src, out, target_file_bytes=1 << 30)["in_bytes"]
    stats = compact_dataset(
        spark, src, out, target_file_bytes=max(1, total // 4 + 1), mode="overwrite"
    )
    assert stats["out_files"] == stats["requested_files"] == 4


def test_compact_coalesce_path_no_shuffle(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "many3.parquet")
    out = str(tmp_path / "coal.parquet")
    _mk_small_files(spark, src, n_parts=8)
    stats = compact_dataset(spark, src, out, target_file_bytes=1 << 30, shuffle=False)
    assert stats["out_files"] == 1
    assert spark.read.parquet(out).count() == 2000


def test_compact_partitioned_layout_bounded(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset, dataset_file_stats

    src = str(tmp_path / "many4.parquet")
    out = str(tmp_path / "bylang.parquet")
    _mk_small_files(spark, src, n_parts=16)
    stats = compact_dataset(
        spark, src, out, target_file_bytes=1 << 30, partition_by=["lang"]
    )
    # 3 partition values, global request of 1 file -> 1 file per value
    assert stats["out_files"] == 3
    assert dataset_file_stats(spark, out)["n_files"] == 3
    visible = sorted(e for e in os.listdir(out) if not e.startswith("."))
    assert visible == ["_SUCCESS", "lang=0", "lang=1", "lang=2"]
    back = spark.read.parquet(out)
    assert back.count() == 2000 and back.select("lang").distinct().count() == 3


def test_compact_refuses_in_place_and_bad_target(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "many5.parquet")
    _mk_small_files(spark, src, n_parts=2)
    with pytest.raises(ValueError, match="must not be the input"):
        compact_dataset(spark, src, src)
    with pytest.raises(ValueError, match="positive"):
        compact_dataset(spark, src, str(tmp_path / "o.parquet"), target_file_bytes=0)


def test_compact_format_conversion(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "many6.parquet")
    out = str(tmp_path / "conv.orc")
    _mk_small_files(spark, src, n_parts=4)
    stats = compact_dataset(spark, src, out, target_file_bytes=1 << 30)
    assert stats["out_files"] == 1
    assert spark.read.orc(out).count() == 2000


def test_compact_refuses_nested_output(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "nested.parquet")
    _mk_small_files(spark, src, n_parts=2)
    with pytest.raises(ValueError, match="nested"):
        compact_dataset(spark, src, src + "/compact.parquet")
    with pytest.raises(ValueError, match="nested"):
        compact_dataset(spark, src, str(tmp_path))  # output contains input


def test_compact_unknown_out_extension_falls_back_to_input_format(spark, tmp_path):
    from fugue_spark.sources.compact import compact_dataset

    src = str(tmp_path / "dated.parquet")
    out = str(tmp_path / "out.2024_01")
    _mk_small_files(spark, src, n_parts=4)
    stats = compact_dataset(spark, src, out, target_file_bytes=1 << 30)
    assert stats["out_files"] == 1
    assert spark.read.parquet(out).count() == 2000
