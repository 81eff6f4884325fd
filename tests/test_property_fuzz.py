"""Property-based differential tests: random frames through engine
primitives, checked against a pandas oracle. The reference has no
randomized testing (SURVEY §5) — this is our addition; seeds are fixed so
failures reproduce.
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

import fugue_spark.api as fa
from fugue_spark import functions as ff
from fugue_spark.schema import parse_schema

N_CASES = 12


def _random_frame(rng: random.Random, n_rows: int, with_nulls: bool = True):
    data = []
    for _ in range(n_rows):
        k = rng.choice([None, 1, 2, 3, 4]) if with_nulls else rng.randint(1, 4)
        v = rng.choice([None, rng.randint(-100, 100)]) if with_nulls else rng.randint(-100, 100)
        s = rng.choice([None, "a", "b", "cc"]) if with_nulls else rng.choice(["a", "b"])
        data.append([k, v, s])
    return data


def _pdf(data):
    return pd.DataFrame(data, columns=["k", "v", "s"])


def _norm_rows(items):
    out = []
    for row in items:
        out.append(
            tuple(
                None
                if x is None or (isinstance(x, float) and math.isnan(x))
                else (int(x) if isinstance(x, float) and x.is_integer() else x)
                for x in row
            )
        )
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def spark_rows(df):
    return _norm_rows([tuple(r) for r in df.collect()])


def pandas_rows(pdf):
    return _norm_rows([tuple(r) for r in pdf.itertuples(index=False)])


@pytest.mark.parametrize("seed", range(N_CASES))
def test_join_inner_matches_pandas(spark, seed):
    rng = random.Random(seed)
    a_data = _random_frame(rng, rng.randint(0, 25))
    b_data = [[r[0], r[1]] for r in _random_frame(rng, rng.randint(0, 25))]
    a = spark.createDataFrame(a_data, parse_schema("k:int,v:int,s:str"))
    b = spark.createDataFrame(b_data, parse_schema("k:int,x:int"))
    got = spark_rows(fa.inner_join(a, b))
    pa_, pb_ = _pdf(a_data), pd.DataFrame(b_data, columns=["k", "x"])
    want = pandas_rows(pa_.dropna(subset=["k"]).merge(pb_.dropna(subset=["k"]), on="k"))
    assert got == want


@pytest.mark.parametrize("seed", range(N_CASES))
def test_setops_match_pandas(spark, seed):
    rng = random.Random(100 + seed)
    a_data = _random_frame(rng, rng.randint(0, 20), with_nulls=False)
    b_data = _random_frame(rng, rng.randint(0, 20), with_nulls=False)
    schema = parse_schema("k:int,v:int,s:str")
    a, b = spark.createDataFrame(a_data, schema), spark.createDataFrame(b_data, schema)
    pa_, pb_ = _pdf(a_data), _pdf(b_data)
    # union distinct
    got = spark_rows(fa.union(a, b))
    want = pandas_rows(pd.concat([pa_, pb_]).drop_duplicates())
    assert got == want
    # intersect distinct
    got = spark_rows(fa.intersect(a, b))
    want = pandas_rows(pa_.drop_duplicates().merge(pb_.drop_duplicates()))
    assert got == want
    # subtract distinct
    got = spark_rows(fa.subtract(a, b))
    merged = pa_.drop_duplicates().merge(pb_.drop_duplicates(), how="left", indicator=True)
    want = pandas_rows(merged[merged._merge == "left_only"].drop(columns="_merge"))
    assert got == want


@pytest.mark.parametrize("seed", range(N_CASES))
def test_take_per_group_matches_pandas(spark, seed):
    rng = random.Random(200 + seed)
    data = _random_frame(rng, rng.randint(1, 40))
    df = spark.createDataFrame(data, parse_schema("k:int,v:int,s:str"))
    n = rng.randint(1, 3)
    got = spark_rows(fa.take(df, n, presort="v DESC", partition={"by": ["k"]}))
    pdf = _pdf(data)
    want = pandas_rows(
        pdf.sort_values("v", ascending=False, na_position="last", kind="mergesort")
        .groupby("k", dropna=False, sort=False)
        .head(n)
    )
    assert got == want


@pytest.mark.parametrize("seed", range(N_CASES))
def test_dropna_fillna_match_pandas(spark, seed):
    rng = random.Random(300 + seed)
    data = _random_frame(rng, rng.randint(0, 30))
    df = spark.createDataFrame(data, parse_schema("k:int,v:int,s:str"))
    pdf = _pdf(data)
    for how in ("any", "all"):
        got = spark_rows(fa.dropna(df, how=how))
        want = pandas_rows(pdf.dropna(how=how))
        assert got == want
    got = spark_rows(fa.fillna(df, {"v": 0, "s": "?"}))
    want = pandas_rows(pdf.fillna({"v": 0, "s": "?"}))
    assert got == want


@pytest.mark.parametrize("seed", range(N_CASES))
def test_transform_identity_preserves_rows(spark, seed):
    rng = random.Random(400 + seed)
    data = _random_frame(rng, rng.randint(0, 30))
    df = spark.createDataFrame(data, parse_schema("k:int,v:int,s:str"))
    res = fa.transform(df, lambda pdf: pdf, schema="*", partition={"by": ["k"]})
    assert spark_rows(res) == pandas_rows(_pdf(data))
    res2 = fa.transform(df, lambda pdf: pdf, schema="*")
    assert spark_rows(res2) == pandas_rows(_pdf(data))


@pytest.mark.parametrize("seed", range(N_CASES))
def test_aggregate_matches_pandas(spark, seed):
    rng = random.Random(500 + seed)
    data = _random_frame(rng, rng.randint(1, 40))
    df = spark.createDataFrame(data, parse_schema("k:int,v:int,s:str"))
    got = spark_rows(
        fa.aggregate(
            df,
            "k",
            n=ff.count(ff.all_cols()),
            mx=ff.max(ff.col("v")),
            mn=ff.min(ff.col("v")),
        )
    )
    pdf = _pdf(data)
    agg = (
        pdf.groupby("k", dropna=False)
        .agg(n=("v", "size"), mx=("v", "max"), mn=("v", "min"))
        .reset_index()
    )
    assert got == pandas_rows(agg)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cotransform_matches_pandas_reference(spark, seed):
    """Randomized zip differential: for every how, cotransform's group
    delivery (which sides present, row contents, empty-side frames) must
    match a driver-side pandas reference built from the same inputs."""
    import numpy as np
    import pandas as pd

    from fugue_spark.cotransform import cotransform
    from fugue_spark.schema import parse_schema

    rng = np.random.default_rng(seed)
    ka = rng.choice(20, size=30)
    kb = rng.choice(20, size=40)
    a = pd.DataFrame({"k": ka.astype("int64"), "va": rng.integers(0, 100, 30).astype("int64")})
    b = pd.DataFrame({"k": kb.astype("int64"), "vb": rng.integers(0, 100, 40).astype("int64")})
    dfa = spark.createDataFrame(a)
    dfb = spark.createDataFrame(b)

    how = ["inner", "left_outer", "right_outer", "full_outer"][seed % 4]

    def summarize(cursor, fa_, fb_):
        return {
            "k": cursor["k"],
            "na": len(fa_),
            "nb": len(fb_),
            "sa": int(fa_.va.sum()) if len(fa_) else -1,
            "sb": int(fb_.vb.sum()) if len(fb_) else -1,
        }

    got = {
        r.k: (r.na, r.nb, r.sa, r.sb)
        for r in cotransform(
            [dfa, dfb], summarize, schema="k:long,na:long,nb:long,sa:long,sb:long", how=how
        ).collect()
    }

    # pandas reference
    keys_a, keys_b = set(a.k), set(b.k)
    if how == "inner":
        keys = keys_a & keys_b
    elif how == "left_outer":
        keys = keys_a
    elif how == "right_outer":
        keys = keys_b
    else:
        keys = keys_a | keys_b
    want = {}
    for k in keys:
        ga, gb = a[a.k == k], b[b.k == k]
        want[k] = (
            len(ga),
            len(gb),
            int(ga.va.sum()) if len(ga) else -1,
            int(gb.vb.sum()) if len(gb) else -1,
        )
    assert got == want, (seed, how)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_asof_join_matches_pandas_merge_asof(spark, seed):
    """asof_join ≡ pandas.merge_asof on random keyed time series — both
    directions, with and without tolerance, including duplicate left
    timestamps and keys with no right rows."""
    rng = random.Random(500 + seed)
    nl, nr = rng.randint(1, 25), rng.randint(0, 20)
    left = pd.DataFrame(
        {
            "k": [rng.randint(1, 3) for _ in range(nl)],
            "t": [rng.randint(0, 60) for _ in range(nl)],
            "lv": list(range(nl)),
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.randint(1, 4) for _ in range(nr)],
            # unique right timestamps per key: merge_asof tie-breaks equal
            # right ts by input order, which no distributed engine can see
            "t": rng.sample(range(200), nr),
            "rv": list(range(nr)),
        }
    )
    direction = rng.choice(["backward", "forward"])
    tol = rng.choice([None, 5, 15])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    got = {
        (r.k, r.t, r.lv): r.r_rv
        for r in fa.asof_join(
            ldf, rdf, on="t", by="k", direction=direction, tolerance_s=tol
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="k", direction=direction,
        **({"tolerance": tol} if tol is not None else {}),
    )
    assert len(got) == nl
    for _, row in want_df.iterrows():
        w = None if pd.isna(row.rv) else int(row.rv)
        assert got[(row.k, row.t, row.lv)] == w, (seed, dict(row), got[(row.k, row.t, row.lv)])


@pytest.mark.parametrize("seed", range(N_CASES))
def test_range_join_matches_pandas_filter(spark, seed):
    """range_join ≡ the brute-force pandas cross-filter on random points
    and intervals (inner + left, random bin widths)."""
    rng = random.Random(900 + seed)
    np_, ni = rng.randint(1, 20), rng.randint(0, 15)
    pts = pd.DataFrame(
        {
            "k": [rng.randint(1, 3) for _ in range(np_)],
            "x": [round(rng.uniform(0, 100), 1) for _ in range(np_)],
            "pid": list(range(np_)),
        }
    )
    lo = [round(rng.uniform(0, 90), 1) for _ in range(ni)]
    iv = pd.DataFrame(
        {
            "k": [rng.randint(1, 3) for _ in range(ni)],
            "lo": lo,
            "hi": [round(v + rng.uniform(0, 30), 1) for v in lo],
            "iid": list(range(ni)),
        }
    )
    how = rng.choice(["inner", "left"])
    bw = rng.choice([None, 1.0, 7.3, 50.0])
    got_rows = fa.range_join(
        spark.createDataFrame(pts),
        spark.createDataFrame(iv),
        point_col="x", lo_col="lo", hi_col="hi", by="k",
        bin_width=bw, how=how,
    ).collect()
    key = lambda t: (t[0], t[1] is None, -1 if t[1] is None else t[1])  # noqa: E731
    got = sorted(((r.pid, r.iid) for r in got_rows), key=key)

    want = []
    matched = set()
    for _, p in pts.iterrows():
        for _, i in iv.iterrows():
            if p.k == i.k and i.lo <= p.x <= i.hi:
                want.append((int(p.pid), int(i.iid)))
                matched.add(int(p.pid))
    if how == "left":
        want += [(int(p.pid), None) for _, p in pts.iterrows() if int(p.pid) not in matched]
    assert got == sorted(want, key=key), (seed, how, bw)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_asof_join_duplicate_right_ts_tiebreak(spark, seed):
    """asof_join(tiebreak_col=) ≡ pandas.merge_asof keep-last on random
    series with DUPLICATE right timestamps — the r06 nondeterminism case.
    rv is the input-order index, so pandas' stable-sort keep-last equals
    our max-tiebreak pick."""
    rng = random.Random(1300 + seed)
    nl, nr = rng.randint(1, 20), rng.randint(1, 25)
    left = pd.DataFrame(
        {
            "k": [rng.randint(1, 3) for _ in range(nl)],
            "t": [rng.randint(0, 30) for _ in range(nl)],
            "lv": list(range(nl)),
        }
    )
    right = pd.DataFrame(
        {
            "k": [rng.randint(1, 3) for _ in range(nr)],
            "t": [rng.randint(0, 30) for _ in range(nr)],  # heavy ties
            "rv": list(range(nr)),
        }
    )
    direction = rng.choice(["backward", "forward"])
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    got = {
        (r.k, r.t, r.lv): r.r_rv
        for r in fa.asof_join(
            ldf, rdf, on="t", by="k", direction=direction, tiebreak_col="rv"
        ).collect()
    }
    want_df = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort"),
        on="t", by="k", direction=direction,
    )
    assert len(got) == nl
    for _, row in want_df.iterrows():
        w = None if pd.isna(row.rv) else int(row.rv)
        assert got[(row.k, row.t, row.lv)] == w, (seed, direction, dict(row))


@pytest.mark.parametrize("seed", range(N_CASES))
def test_jpeg_codec_roundtrip_fuzz(seed):
    """Random images through the pure-python JPEG codec: constant images
    at quality 100 round-trip EXACTLY; smooth images stay within a tight
    error bound across sizes/subsampling/restart settings; and every
    truncation of a valid stream raises ValueError (never a raw
    struct/index error)."""
    import numpy as np

    from fugue_spark.pipeline.codecs import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(4200 + seed)
    h, w = int(rng.integers(1, 41)), int(rng.integers(1, 41))

    # exact: constant image, any channel mode, quality 100
    val = int(rng.integers(0, 256))
    gray = np.full((h, w), val, dtype=np.uint8)
    _m, px = decode_jpeg_pixels(encode_jpeg(gray, quality=100))
    assert np.array_equal(px[:, :, 0], gray)

    # smooth content: cumulative small steps, bounded error
    steps = rng.integers(-3, 4, (h, w))
    smooth = np.clip(128 + np.cumsum(np.cumsum(steps, 0), 1), 0, 255).astype(np.uint8)
    quality = int(rng.integers(85, 101))
    if rng.random() < 0.5:
        img = smooth
        sub, tol = "4:4:4", 14
    else:
        # channels share the spatial structure (smooth chroma) — channels
        # with unrelated structure would make chroma high-frequency, and
        # subsampling is SUPPOSED to lose that
        img = np.stack(
            [
                smooth,
                np.clip(smooth.astype(int) * 8 // 10 + 20, 0, 255).astype(np.uint8),
                np.clip(smooth.astype(int) * 6 // 10 + 40, 0, 255).astype(np.uint8),
            ],
            axis=2,
        )
        sub = rng.choice(["4:4:4", "4:2:2", "4:2:0"])
        tol = 22
    rst = int(rng.integers(0, 4))
    blob = encode_jpeg(img, quality=quality, subsampling=sub, restart_interval=rst)
    meta, out = decode_jpeg_pixels(blob)
    assert (meta["width"], meta["height"]) == (w, h)
    got = out[:, :, 0] if img.ndim == 2 else out
    assert np.abs(got.astype(int) - img.astype(int)).max() <= tol, (seed, quality, sub)

    # truncations: honest single-type failure (or, rarely, a shorter-but-
    # self-consistent prefix is simply not a failure we can detect)
    for cut in sorted(rng.integers(2, len(blob), 3)):
        try:
            decode_jpeg_pixels(blob[:cut])
        except ValueError:
            pass


@pytest.mark.parametrize("seed", range(N_CASES))
def test_avi_codec_roundtrip_fuzz(seed):
    """Random MJPEG-in-AVI containers: frame chunks round-trip
    byte-exactly, header meta is faithful, truncations raise ValueError."""
    import numpy as np

    from fugue_spark.pipeline.codecs import (
        decode_avi,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(5100 + seed)
    n = int(rng.integers(1, 7))
    gw, gh = int(rng.integers(1, 4)), int(rng.integers(1, 4))
    frames = []
    for _ in range(n):
        tiles = rng.integers(0, 256, (gh, gw), dtype=np.uint8)
        frames.append(encode_jpeg(np.repeat(np.repeat(tiles, 8, 0), 8, 1), quality=100))
    fps = int(rng.integers(1, 31))
    avi = encode_avi_mjpeg(frames, gw * 8, gh * 8, fps=fps)
    meta, got = decode_avi(avi)
    assert got == frames
    assert (meta["n_frames"], meta["width"], meta["height"]) == (n, gw * 8, gh * 8)
    assert meta["duration_ms"] == n * (1_000_000 // fps) // 1000
    for cut in sorted(rng.integers(1, len(avi), 3)):
        try:
            decode_avi(avi[:cut])
        except ValueError:
            pass


@pytest.mark.parametrize("seed", range(N_CASES))
def test_trace_compiler_differential_fuzz(spark, seed):
    """Random per-group functions through the trace compiler: the
    compiled plan (groupBy-agg, window, or running shape) must equal the
    pandas path value-for-value on random frames WITH NULLS. Exercises
    filtered reductions, scalar composition, key access, len(), per-row
    vectors mixed with reductions, and the ordered running ops."""
    import math

    from fugue_spark.schema import parse_schema
    from fugue_spark.transform import transform

    rng = random.Random(7000 + seed)
    n = rng.randint(1, 30)
    rows = []
    for i in range(n):
        rows.append(
            [
                rng.randint(1, 3),  # k
                i,  # i: unique presort key
                rng.choice([None, round(rng.uniform(-50, 50), 2)]),  # x
                rng.randint(-20, 20),  # y
            ]
        )
    df = spark.createDataFrame(rows, parse_schema("k:long,i:long,x:double,y:long"))
    a, b, c = rng.randint(1, 5), rng.randint(-3, 3), rng.randint(-10, 10)
    shape = rng.choice(["agg", "window", "running"])

    if shape == "agg":
        def fn(pdf):
            sub = pdf[pdf.y > c]
            return {
                "k": pdf.k.values[0],
                "s": (pdf.x * a + b).sum(),
                "m": pdf.y.max(),
                "n": pdf.shape[0],
                "cond_s": sub.y.sum(),
                "cond_n": sub.y.count(),
            }
        schema = "k:long,s:double,m:long,n:long,cond_s:long,cond_n:long"
        part = {"by": ["k"]}
    elif shape == "window":
        def fn(pdf):
            m = pdf.y.mean()
            return {
                "k": pdf.k.values[0],
                "i": pdf.i.values,
                "centered": (pdf.y - m) * a,
                "n": len(pdf),
            }
        schema = "k:long,i:long,centered:double,n:long"
        part = {"by": ["k"]}
    else:
        def fn(pdf):
            return {
                "k": pdf.k.values[0],
                "i": pdf.i.values,
                "run": pdf.y.cumsum(),
                "prev": pdf.y.shift(1, fill_value=b).astype("int64"),
                "hi": pdf.y.cummax(),
            }
        schema = "k:long,i:long,run:long,prev:long,hi:long"
        part = {"by": ["k"], "presort": "i ASC"}

    pd_out = transform(df, fn, schema=schema, partition=part).toPandas()
    cc_out = transform(df, fn, schema=schema, partition=part, compile="strict").toPandas()

    def norm(pdf):
        cols = sorted(pdf.columns)
        out = []
        for row in pdf[cols].itertuples(index=False):
            vals = []
            for v in row:
                if v is None or (isinstance(v, float) and v != v):
                    vals.append(None)
                elif isinstance(v, float):
                    vals.append(round(v, 6))
                else:
                    vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))

    va, vb = norm(pd_out), norm(cc_out)
    assert len(va) == len(vb), (seed, shape, len(va), len(vb))
    for ra, rb in zip(va, vb):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (seed, shape, ra, rb)
            else:
                assert x == y, (seed, shape, ra, rb)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_cotransform_compiler_differential_fuzz(spark, seed):
    """Random inner-zip reducers through the cotransform compiler:
    per-side reductions + cross-side scalar composition must equal the
    zip engine's pandas path on random keyed frames with NULLs."""
    import math

    from fugue_spark.cotransform import cotransform
    from fugue_spark.schema import parse_schema

    rng = random.Random(8000 + seed)
    na, nb = rng.randint(1, 25), rng.randint(1, 25)
    rows_a = [
        [rng.randint(1, 4), rng.choice([None, round(rng.uniform(-10, 10), 2)])]
        for _ in range(na)
    ]
    rows_b = [[rng.randint(1, 5), rng.randint(-20, 20)] for _ in range(nb)]
    dfa = spark.createDataFrame(rows_a, parse_schema("k:long,x:double"))
    dfb = spark.createDataFrame(rows_b, parse_schema("k:long,y:long"))
    a, c = rng.randint(1, 4), rng.randint(-5, 5)

    def gap(cursor, fa_, fb_):
        sx = (fa_.x * a).sum()
        hi = fb_[fb_.y > c].y.max()
        return {
            "k": cursor["k"],
            "sx": sx,
            "hi": hi,
            "mix": sx - fb_.y.sum(),
            "na": fa_.shape[0],
        }

    # hi is double: pandas max over an empty filtered subset is NaN,
    # which cannot live in a long column on the dict-output path
    schema = "k:long,sx:double,hi:double,mix:double,na:long"
    p = cotransform([dfa, dfb], gap, schema=schema, how="inner").toPandas()
    q = cotransform([dfa, dfb], gap, schema=schema, how="inner", compile="strict").toPandas()

    def norm(pdf):
        cols = sorted(pdf.columns)
        rows = []
        for r in pdf[cols].itertuples(index=False):
            rows.append(
                tuple(
                    None
                    if v is None or (isinstance(v, float) and v != v)
                    else (round(v, 6) if isinstance(v, float) else v)
                    for v in r
                )
            )
        return sorted(rows, key=lambda t: tuple((x is None, str(x)) for x in t))

    va, vb = norm(p), norm(q)
    assert len(va) == len(vb), (seed, len(va), len(vb))
    for ra, rb in zip(va, vb):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9), (seed, ra, rb)
            else:
                assert x == y, (seed, ra, rb)


def _brute_cross_jaccard(probe_docs, corpus_docs, n, thr_e4):
    """Exact cross-corpus word-shingle Jaccard pairs — the oracle for
    minhash_lsh_pairs_against (same normalization as the operator)."""
    import re as _re

    def shingles(t):
        w = _re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        return {" ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 0))}

    out = set()
    for pid, pt in probe_docs:
        sp = shingles(pt)
        if not sp:
            continue
        for cid, ct in corpus_docs:
            sc = shingles(ct)
            if not sc:
                continue
            inter = len(sp & sc)
            if inter * 10000 >= thr_e4 * (len(sp) + len(sc) - inter):
                out.add((pid, cid))
    return out


@pytest.mark.parametrize("seed", range(6))
def test_cross_corpus_lsh_matches_bruteforce(spark, seed):
    """Differential fuzz: on random corpora with planted near-dups, the LSH
    output is a SUBSET of exact cross pairs (verify stage guarantees no
    false positives) and captures every planted high-jaccard pair."""
    rng = random.Random(1000 + seed)
    vocab = ["spark", "query", "table", "join", "scan", "agg", "row", "key",
             "data", "batch", "line", "sort", "fast", "slow"]

    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 30)))

    corpus_docs = [(100 + i, doc()) for i in range(15)]
    probe_docs = [(i, doc()) for i in range(8)]
    # plant near-identical copies (one-word tail change = high jaccard)
    planted = []
    for i in range(3):
        cid, ct = corpus_docs[rng.randrange(len(corpus_docs))]
        pid = 50 + i
        probe_docs.append((pid, ct + " tailword"))
        planted.append((pid, cid))
    probe = spark.createDataFrame(
        [[i, t] for i, t in probe_docs], parse_schema("doc_id:long,text:str")
    )
    corpus = spark.createDataFrame(
        [[i, t] for i, t in corpus_docs], parse_schema("doc_id:long,text:str")
    )
    from fugue_spark.pipeline import minhash_lsh_pairs_against

    got = {
        (r.probe_id, r.corpus_id)
        for r in minhash_lsh_pairs_against(
            probe, corpus, threshold=0.5, num_hashes=64, bands=16, n=3
        ).collect()
    }
    exact = _brute_cross_jaccard(probe_docs, corpus_docs, 3, 5000)
    assert got <= exact  # exact-verify stage: no false positives, ever
    strong = _brute_cross_jaccard(probe_docs, corpus_docs, 3, 8000)
    assert strong <= got  # j>=0.8 pairs: capture probability ~1 at b16/r4
    assert set(planted) <= got


@pytest.mark.parametrize("seed", range(5))
def test_select_until_budget_matches_pandas(spark, seed):
    """Differential fuzz: global and per-group budgeted selection vs the
    pandas cumsum construction on random sizes/budgets."""
    rng = random.Random(2000 + seed)
    n = rng.randint(0, 60)
    rows = [[i, rng.choice(["a", "b", "c"]), rng.randint(0, 20)] for i in range(n)]
    budget = rng.randint(0, 300)
    pdf = pd.DataFrame({"id": [r[0] for r in rows], "g": [r[1] for r in rows],
                        "sz": [r[2] for r in rows]})
    df = spark.createDataFrame(rows, parse_schema("id:long,g:str,sz:long")) \
        if rows else spark.createDataFrame([], parse_schema("id:long,g:str,sz:long"))

    from fugue_spark.pipeline import select_until_budget

    got = sorted(r.id for r in select_until_budget(df, budget, "sz", "id").collect())
    want = sorted(pdf[pdf["sz"].cumsum() <= budget]["id"]) if len(pdf) else []
    assert got == list(want)

    got_g = sorted(
        r.id for r in select_until_budget(df, budget, "sz", "id", by=["g"]).collect()
    )
    if len(pdf):
        keep = pdf.assign(c=pdf.groupby("g")["sz"].cumsum())
        want_g = sorted(keep[keep["c"] <= budget]["id"])
    else:
        want_g = []
    assert got_g == list(want_g)


@pytest.mark.parametrize("seed", range(4))
def test_weighted_hash_sample_matches_duckdb(spark, seed):
    """Cross-engine exactness fuzz for the hex-threshold construction:
    random weights (incl. 0/1/tiny/boundary values) must select the
    IDENTICAL subset in Spark and DuckDB."""
    import duckdb

    rng = random.Random(3000 + seed)
    specials = [0.0, 1.0, 0.5, 1e-9, 0.999999, 2.0, -1.0]
    rows = []
    for i in range(300):
        w = rng.choice(specials) if rng.random() < 0.3 else rng.random()
        rows.append([i, float(w)])
    df = spark.createDataFrame(rows, parse_schema("id:long,w:double"))
    from fugue_spark.operators import weighted_hash_sample

    got = sorted(r.id for r in weighted_hash_sample(df, "w", key_cols=["id"]).collect())

    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE t (id BIGINT, w DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        r[0]
        for r in con.execute(
            """
            SELECT id FROM (
              SELECT id, least(greatest(w, 0.0), 1.0) AS cw FROM t
            ) WHERE cw >= 1.0
               OR substr(md5(CAST(id AS VARCHAR)), 1, 15)
                  < printf('%015x', CAST(FLOOR(cw * 1152921504606846976.0) AS BIGINT))
            """
        ).fetchall()
    )
    assert got == want


@pytest.mark.parametrize("seed", range(6))
def test_temperature_mix_cross_engine_fuzz(spark, seed):
    """Cross-engine exactness fuzz for the temperature-mix contract:
    random skewed strata and alphas (incl. the 0/1 endpoints) must select
    the IDENTICAL subset in Spark (rates computed driver-side in Python)
    and DuckDB (rates recomputed in SQL with POWER) — the no-cross-stratum-
    float-sum design is exactly what makes this hold."""
    import duckdb

    rng = random.Random(4000 + seed)
    alpha = rng.choice([0.0, 0.25, 0.3, 0.5, 0.7, 1.0, rng.random()])
    n_strata = rng.randint(2, 8)
    rows = []
    i = 0
    for s in range(n_strata):
        # skewed sizes: 1 to ~300 rows per stratum
        for _ in range(rng.choice([1, 3, 10, 40, 150, 300])):
            rows.append([i, f"s{s}"])
            i += 1
    df = spark.createDataFrame(rows, parse_schema("id:long,grp:str"))
    from fugue_spark.operators.sampling import temperature_mix

    got = sorted(
        r.id for r in temperature_mix(df, "grp", alpha, key_cols=["id"]).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TEMP TABLE t (id BIGINT, grp VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        r[0]
        for r in con.execute(
            f"""
            WITH c AS (SELECT grp, COUNT(*) AS n FROM t GROUP BY grp),
                 m AS (SELECT MIN(n) AS n_min FROM c),
                 r AS (SELECT grp,
                              FLOOR(POWER(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE),
                                          1.0 - {alpha!r}) * 1000000000)
                              / 1000000000 AS w
                       FROM c, m)
            SELECT t.id FROM t JOIN r ON t.grp = r.grp
            WHERE w >= 1.0
               OR substr(md5(CAST(t.id AS VARCHAR)), 1, 15)
                  < printf('%015x', CAST(FLOOR(w * 1152921504606846976.0) AS BIGINT))
            """
        ).fetchall()
    )
    assert got == want, (alpha, len(got), len(want))


@pytest.mark.parametrize("seed", range(8))
def test_semantic_dedup_matches_duckdb_replay_fuzz(spark, seed):
    """semantic_dedup (first-k mode) vs an independent DuckDB replay of the
    same semantics on random embeddings: random corpus size, dimension,
    cluster count and threshold per seed — assignment AND survivor set
    must agree exactly (e6-floor contract)."""
    import duckdb
    import numpy as np

    from fugue_spark.pipeline import semantic_dedup

    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(20, 120))
    dim = int(rng.choice([4, 16, 64]))
    k = int(rng.integers(2, 9))
    thr = float(rng.choice([0.2, 0.35, 0.5, 0.9]))
    base = rng.standard_normal((n, dim))
    # plant a few near-copies so the drop path is exercised at high thr
    for i in range(0, n, 7):
        j = (i + 3) % n
        base[j] = base[i] + 0.01 * rng.standard_normal(dim)
    rows = [[i, [float(x) for x in base[i]]] for i in range(n)]
    df = spark.createDataFrame(rows, parse_schema("vec_id:long,embedding:[float]"))
    got = sorted(
        (r.vec_id, r.cluster)
        for r in semantic_dedup(df, threshold=thr, n_clusters=k).select(
            "vec_id", "cluster"
        ).collect()
    )

    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [np.asarray(v, dtype=np.float32).tolist() for _, v in ((r[0], r[1]) for r in rows)]}
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    dot = (
        "list_reduce(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]),"
        " x -> x[1] * x[2]), (p, q) -> p + q)"
    )
    normv = "sqrt(list_reduce(list_transform({a}::DOUBLE[], x -> x * x), (p, q) -> p + q))"

    def cos_e6(a, b):
        return (
            f"CAST(FLOOR(({dot.format(a=a, b=b)}) / "
            f"(({normv.format(a=a)}) * ({normv.format(a=b)})) * 1000000) AS BIGINT)"
        )

    want = sorted(
        (int(v), int(c))
        for v, c in con.sql(
            f"""
        WITH cent AS (
          SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, embedding AS cvec
          FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k})
        ),
        assign AS (
          SELECT vec_id, embedding, cid FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                     ORDER BY {cos_e6('e.embedding', 'c.cvec')} DESC, c.cid) AS rn
            FROM embeddings e CROSS JOIN cent c
          ) WHERE rn = 1
        )
        SELECT a.vec_id, a.cid FROM assign a
        WHERE NOT EXISTS (
          SELECT 1 FROM assign b
          WHERE b.cid = a.cid AND b.vec_id < a.vec_id
            AND {cos_e6('a.embedding', 'b.embedding')} >= {int(thr * 1000000)}
        )
        """
        ).fetchall()
    )
    assert got == want and 0 < len(got) <= n


@pytest.mark.parametrize("seed", range(6))
def test_bloom_no_false_negative_fuzz(spark, seed):
    """Random geometry + random corpus: every history document re-probed
    must flag (the exact guarantee), in BOTH probe modes, at any n_bits/
    n_hashes; dedup_incremental with history equals the exact anti-join."""
    import random as _r

    from fugue_spark.pipeline import bloom_build, bloom_flag, dedup_incremental
    from fugue_spark.schema import parse_schema as _ps

    rng = _r.Random(500 + seed)
    n_bits = 64 * rng.randint(4, 4096)
    n_hashes = rng.randint(1, 8)
    n_hist = rng.randint(5, 200)
    rows = [[i, f"doc {seed} {i} " + " ".join(str(rng.randint(0, 9)) for _ in range(10))]
            for i in range(n_hist)]
    hist = spark.createDataFrame(rows, _ps("doc_id:long,text:str"))
    bloom = bloom_build(hist, n_bits=n_bits, n_hashes=n_hashes)
    for mode in ("join", "broadcast"):
        flagged = bloom_flag(hist, bloom, mode=mode)
        assert flagged.filter("NOT maybe_dup").count() == 0, (mode, n_bits, n_hashes)
    # exact incremental: resend half + fresh rows; result == fresh rows only
    resent = hist.limit(n_hist // 2 + 1)
    fresh = spark.createDataFrame(
        [[10_000 + i, f"fresh {seed} {i} zz"] for i in range(20)],
        _ps("doc_id:long,text:str"),
    )
    out = dedup_incremental(resent.unionByName(fresh), bloom, history=hist)
    assert sorted(r.doc_id for r in out.collect()) == [10_000 + i for i in range(20)]


@pytest.mark.parametrize("seed", range(5))
def test_compact_lossless_fuzz(spark, seed, tmp_path):
    """Random input fragmentation x random target: output file count equals
    the request and the row multiset survives exactly."""
    import random as _r

    from fugue_spark.sources.compact import compact_dataset

    rng = _r.Random(900 + seed)
    n_rows = rng.randint(100, 3000)
    n_parts = rng.randint(1, 24)
    src = str(tmp_path / f"fz{seed}_in.parquet")
    out = str(tmp_path / f"fz{seed}_out.parquet")
    df = spark.range(0, n_rows).selectExpr("id", "id % 5 AS g", "repeat('y', 20) AS pad")
    df.repartition(n_parts).write.mode("overwrite").parquet(src)
    total = compact_dataset(spark, src, out, target_file_bytes=1 << 30)
    want_files = rng.randint(1, 6)
    stats = compact_dataset(
        spark, src, out,
        target_file_bytes=max(1, total["in_bytes"] // want_files + 1),
        mode="overwrite", shuffle=bool(rng.getrandbits(1)),
    )
    assert stats["requested_files"] == want_files
    if stats["requested_files"] <= n_parts or True:
        a = sorted(r.id for r in spark.read.parquet(src).collect())
        b = sorted(r.id for r in spark.read.parquet(out).collect())
        assert a == b
    # coalesce cannot grow the partition count; repartition hits it exactly
    if stats["out_files"] != want_files:
        assert stats["out_files"] <= n_parts
