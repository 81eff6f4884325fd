"""sample / take (reference: fugue/execution/execution_engine.py:682-734).

``take`` follows the *pandas* null convention: ``na_position`` first/last
applies to nulls regardless of sort direction (unlike SQL, where NULLS
FIRST/LAST defaults flip with ASC/DESC) — reference notes this explicitly
(execution_engine.py:717-722). Grouped take is the row_number window
pattern; ``n==1`` without presort degenerates to ``dropDuplicates`` on the
keys (no window, cheaper shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fugue_spark.partition import PartitionSpec, parse_presort

__all__ = ["sample", "take", "hash_sample", "sample_per_key", "temperature_mix"]


def sample(
    df: DataFrame,
    n: "int | None" = None,
    frac: "float | None" = None,
    replace: bool = False,
    seed: "int | None" = None,
    method: str = "rng",
    key_cols: "list[str] | None" = None,
) -> DataFrame:
    """Row sampling (reference ExecutionEngine.sample,
    execution_engine.py:600-640: frac/n, replace, seed).

    ``method`` is a superset extension: the default ``"rng"`` is the
    reference's per-partition RNG semantics; ``"hash"`` is a fully
    deterministic, ENGINE-REPRODUCIBLE fraction sample — a row is kept
    iff md5(seed + its ``key_cols``) falls below ``frac`` of the hash
    space (the :func:`hash_sample` contract, with the seed salted into
    the key so different seeds select different subsets). The same rows
    fall out of Spark, DuckDB, or any reimplementation, on any
    partitioning, forever — use it when a sample must be auditable.
    ``method="hash"`` requires ``frac`` and ``key_cols`` (a stable row
    identity — key on a group column to keep/drop whole groups).
    """
    if method == "hash":
        if frac is None or replace or not key_cols:
            raise ValueError(
                "sample(method='hash') needs frac and key_cols, without replace"
            )
        salt = [F.lit(str(seed))] if seed is not None else []
        key = F.concat_ws(
            "\x1f", *salt, *[F.col(c).cast("string") for c in key_cols]
        )
        thr = _md5_threshold(frac)
        return df if thr is None else df.filter(F.md5(key) < F.lit(thr))
    if method != "rng":
        raise ValueError(f"unknown sample method {method!r}")
    if (n is None) == (frac is None):
        raise ValueError("provide exactly one of n / frac")
    if frac is not None:
        return df.sample(withReplacement=replace, fraction=frac, seed=seed)
    if replace:
        # with-replacement n-row sample: Poisson oversample map-side (each
        # row drawn independently — no shuffle, no driver materialization),
        # then trim to exactly n. The slack term keeps P(short) negligible;
        # the reference's suite accepts approximate n for sampling
        # (fugue_test/execution_suite.py:866-878).
        total = df.count()
        if total == 0 or n <= 0:
            return df.limit(0)
        over = (n / total) * 1.2 + 12.0 / total
        return df.sample(withReplacement=True, fraction=over, seed=seed).limit(n)
    if seed is None:
        # arbitrary n rows — cheapest plan (LIMIT, no shuffle of the rest)
        return df.limit(n)
    # deterministic n-row sample: random order then limit (superset of the
    # reference, which rejects n+seed on Spark: execution_engine.py:617-626)
    return df.orderBy(F.rand(seed)).limit(n)


def _sort_cols(presort: list[tuple[str, bool]], na_position: str):
    cols = []
    for name, asc in presort:
        c = F.col(name)
        if na_position == "first":
            cols.append(c.asc_nulls_first() if asc else c.desc_nulls_first())
        else:
            cols.append(c.asc_nulls_last() if asc else c.desc_nulls_last())
    return cols


def take(
    df: DataFrame,
    n: int,
    presort: "str | list[tuple[str, bool]] | None" = None,
    na_position: str = "last",
    partition: "PartitionSpec | dict | None" = None,
) -> DataFrame:
    if not isinstance(n, int) or n <= 0:
        raise ValueError(f"n must be a positive int, got {n!r}")
    if na_position not in ("first", "last"):
        raise ValueError(f"na_position must be 'first' or 'last', got {na_position!r}")
    spec = PartitionSpec(partition) if not isinstance(partition, PartitionSpec) else partition
    sort_list = parse_presort(presort) or spec.presort
    cols = _sort_cols(sort_list, na_position)
    if not spec.by:
        return df.orderBy(*cols).limit(n) if cols else df.limit(n)
    if n == 1 and not sort_list:
        return df.dropDuplicates(subset=spec.by)
    w = Window.partitionBy(*spec.by).orderBy(*(cols or [F.lit(1)]))
    return (
        df.withColumn("__fugue_rn__", F.row_number().over(w))
        .filter(F.col("__fugue_rn__") <= n)
        .drop("__fugue_rn__")
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_cols: "list[str]",
    sep: str = "\x1f",
) -> DataFrame:
    """Deterministic, engine-reproducible sampling: keep a row iff the md5
    of its key is below ``rate`` of the hash space (hex-string compare —
    md5 is identical everywhere, so the same subset falls out of Spark,
    DuckDB, or anything else, forever).

    Unlike ``sample`` (per-run RNG), this is the curation tool: keyed on a
    stable id it yields reproducible corpus subsets; keyed on a GROUP
    column (user_id, domain) it keeps or drops whole groups together —
    leak-free train/eval splits. Map-only, no shuffle, scan speed.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if not key_cols:
        raise ValueError("hash_sample needs at least one key column")
    # threshold = rate of the 128-bit space, as a 32-hex-digit string; the
    # DECIMAL rate is interpreted exactly (Fraction of its repr) so the
    # contract — and any external reimplementation — doesn't inherit
    # binary-float quirks: rate=0.1 is exactly 2^128/10
    from fractions import Fraction

    fr = Fraction(repr(rate))
    t = ((1 << 128) * fr.numerator) // fr.denominator
    if t >= (1 << 128):
        return df
    thr = format(t, "032x")
    key = F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.md5(key) < F.lit(thr))


def _md5_threshold(rate: float) -> "str | None":
    """``rate`` of the 128-bit md5 space as a 32-hex-digit string (None =
    keep everything). Exact-Fraction interpretation of the decimal repr —
    the hash_sample contract."""
    from fractions import Fraction

    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    fr = Fraction(repr(rate))
    t = ((1 << 128) * fr.numerator) // fr.denominator
    if t >= (1 << 128):
        return None
    return format(t, "032x")


def hash_sample_stratified(
    df: DataFrame,
    rates: "dict[str, float]",
    key_cols: "list[str]",
    strata_col: str,
    default_rate: float = 0.0,
    sep: str = "\x1f",
) -> DataFrame:
    """Dataset mixing: a different deterministic sampling rate per stratum
    (source, language, domain) — the standard corpus-reweighting move when
    composing a training mix. Strata absent from ``rates`` get
    ``default_rate`` (0 = drop).

    Same md5 contract as hash_sample (engine-reproducible, keyed grouping
    gives leak-free splits), so the SAME rows fall out of any engine. The
    per-stratum threshold is a CASE over ``strata_col`` — still map-only,
    no shuffle, scan speed regardless of the number of strata.
    """
    if not key_cols:
        raise ValueError("hash_sample_stratified needs at least one key column")
    thr_col = F.lit(_md5_threshold(default_rate) or "g")  # 'g' > any hex digit
    for s, r in sorted(rates.items()):
        t = _md5_threshold(r)
        thr_col = F.when(
            F.col(strata_col) == F.lit(s), F.lit(t if t is not None else "g")
        ).otherwise(thr_col)
    key = F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols])
    return df.filter(F.md5(key) < thr_col)


def sample_per_key(
    df: DataFrame,
    n: int,
    by: "str | list[str]",
    id_cols: "list[str]",
    seed: str = "",
    sep: str = "\x1f",
) -> DataFrame:
    """Exact-``n`` per-group deterministic uniform sample — the
    distributed replacement for per-group reservoir sampling: rank each
    group's rows by ``md5(seed + id)`` and keep the ``n`` smallest.

    md5 over a unique id is a uniform pseudo-random permutation, so the
    kept rows are a uniform sample — but unlike RNG-state reservoirs the
    choice is a pure function of row CONTENT: the same rows fall out of
    any engine, any partitioning, any rerun (the ``hash_sample``
    reproducibility contract, applied per group). ``seed`` re-draws the
    sample. ONE keyed window exchange, no driver state; groups smaller
    than ``n`` are kept whole. At 100 TB this is the per-domain /
    per-language corpus down-sampling primitive.
    """
    from pyspark.sql import Window

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if not id_cols:
        raise ValueError("sample_per_key needs id_cols to rank on")
    if "__rn__" in df.columns:
        raise ValueError(
            "column '__rn__' is a reserved internal name of sample_per_key — rename it first"
        )
    keys = [by] if isinstance(by, str) else list(by)
    rank_col = F.md5(
        F.concat_ws(sep, F.lit(seed), *[F.col(c).cast("string") for c in id_cols])
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        rank_col.asc(), *[F.col(c).asc() for c in id_cols]
    )
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= int(n))
        .drop("__rn__")
    )


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: "list[str]",
    sep: str = "\x1f",
) -> DataFrame:
    """Quality-weighted deterministic sampling: keep each row with
    probability ``clamp(weight, 0, 1)`` — but decided by the row's md5,
    not an RNG, so the SAME rows fall out of any engine, partitioning, or
    rerun (the per-row generalization of :func:`hash_sample`; the standard
    quality-proportional corpus selection move).

    Mechanics: the first 15 md5 hex digits are a 60-bit uniform; the row's
    weight becomes a 15-hex-digit threshold via ``format('%015x',
    floor(weight * 2^60))`` and the keep test is a plain string compare —
    equal-length lowercase hex compares numerically, and both sides are
    exact integer/IEEE-double operations every engine reproduces bit-for-
    bit. ``weight >= 1`` keeps unconditionally. Map-only, no shuffle.
    """
    if not key_cols:
        raise ValueError("weighted_hash_sample needs at least one key column")
    key = F.concat_ws(sep, *[F.col(c).cast("string") for c in key_cols])
    u = F.substring(F.md5(key), 1, 15)
    w = F.least(
        F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0)
    )
    thr = F.format_string(
        "%015x", F.floor(w * F.lit(float(1 << 60))).cast("long")
    )
    return df.filter((w >= 1.0) | (u < thr))


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    alpha: float,
    key_cols: "list[str]",
    sep: str = "\x1f",
) -> DataFrame:
    """Temperature-flattened corpus mixing: deterministically downsample
    each stratum (language, source, domain) so kept sizes follow
    ``n_s**alpha`` — the standard multilingual rebalancing move (alpha=1
    keeps the natural distribution, alpha=0 levels every stratum down to
    the smallest; alpha around 0.3-0.7 is the usual training-mix range).

    Rates are ANCHORED AT THE SMALLEST STRATUM (kept in full):
    ``r_s = (n_min / n_s) ** (1 - alpha)``, quantized to 1e-9 by FLOOR.
    A NULL stratum is a stratum like any other (counted, rated, kept at
    its own rate — NULL rows are never silently dropped). The formulation
    deliberately avoids any cross-stratum SUM: min, one division and one
    pow per stratum, so an external system (or the DuckDB oracle) can
    re-derive the rates from the counts alone — a normalized-share
    formulation would additionally depend on float summation order.
    (pow itself is libm-dependent in the last ulp; the 1e-9 FLOOR grid
    makes a cross-libm boundary flip require the true rate to sit within
    an ulp of a grid point — verify against your own stack if the kept
    set must be bit-stable across toolchains.)

    Selection delegates to :func:`weighted_hash_sample` (md5-decided,
    content-keyed — partition/engine/rerun-invariant, leak-free when
    keyed on a grouping id). Cost: one count per stratum (map-side
    combined, stays IN-PLAN — stratum cardinality never touches the
    driver), an in-plan global ``min`` reduced to one row and
    broadcast-joined back onto the counts frame to form the #strata-row
    rate table, then a broadcast join of that table onto the data (flat
    cost at ANY stratum cardinality — a CASE chain would build an
    unboundedly deep expression tree for e.g. per-domain strata) + the
    map-only filter. The data itself never shuffles.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    if not key_cols:
        raise ValueError("temperature_mix needs at least one key column")
    for reserved in ("__stratum__", "__w__"):
        if reserved in df.columns:
            raise ValueError(
                f"temperature_mix reserves column name {reserved!r}; "
                "rename it before calling (it would collide with the "
                "internal rate-table columns)"
            )
    counts = df.groupBy(F.col(strata_col).alias("__stratum__")).agg(
        F.count(F.lit(1)).alias("__n__")
    )
    n_min = counts.agg(F.min("__n__").alias("__n_min__"))
    # rate per stratum, anchored at the global min (1-row broadcast —
    # bounded); FLOOR to the 1e-9 grid exactly as documented above
    rates = counts.join(F.broadcast(n_min)).select(
        F.col("__stratum__"),
        (
            F.floor(
                F.pow(
                    F.col("__n_min__").cast("double") / F.col("__n__").cast("double"),
                    F.lit(1.0 - alpha),
                )
                * F.lit(1e9)
            ).cast("double")
            / F.lit(1e9)
        ).alias("__w__"),
    )
    joined = df.join(
        F.broadcast(rates),
        F.col(strata_col).eqNullSafe(F.col("__stratum__")),
        "left",
    )
    return weighted_hash_sample(joined, "__w__", key_cols, sep).drop(
        "__stratum__", "__w__"
    )
