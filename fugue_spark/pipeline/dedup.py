"""Deduplication operators for 100 TB-scale corpora.

Five strategies, each expressed as a shuffle-conscious DataFrame plan:

* exact            — fingerprint hash → groupBy keep-first. One shuffle on
                     a 128-bit key; at scale the shuffle carries (id, hash)
                     only, never the text.
* ngram_jaccard    — word n-gram shingles → explode → inverted-index
                     self-join on shingle → per-pair intersection count →
                     Jaccard. Exact but quadratic in worst case; the
                     shingle join is the classic "small candidate set"
                     trick: only pairs sharing ≥1 shingle are generated.
* minhash_lsh      — shingle → m minhashes (one groupBy, m min() aggs) →
                     b bands → band-bucket join produces candidates →
                     exact-Jaccard verify. Near-linear; the banded join is
                     the scale path (no all-pairs anywhere).
* simhash          — 64-bit simhash per doc (vectorized pandas UDF, no
                     shuffle) → 16-bit chunk banding (pigeonhole: hamming
                     ≤3 ⇒ ≥1 of 4 chunks equal) → candidate join →
                     popcount verify.
* embedding cosine — see similarity.py (near_duplicates_by_embedding).

All emit candidate/confirmed duplicate PAIRS (id_a < id_b) so downstream
can pick survivors; ``dedup_exact`` also offers keep-first directly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash_pairs",
]


def _normalized(text_col: str) -> F.Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per distinct normalized text. The shuffle key
    is the md5 fingerprint, not the document — at 100 TB the exchange moves
    ~48 bytes/row."""
    fp = F.md5(_normalized(text_col))
    w = Window.partitionBy("__fp__").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__fp__", fp)
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__fp__", "__rn__")
    )


def _shingles(text_col: str, n: int) -> F.Column:
    """Distinct word n-gram shingles of the normalized text."""
    words = F.split(_normalized(text_col), " ")
    k = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.array_distinct(grams)


def _shingle_index(df: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """(id, g) inverted index over 64-bit shingle hashes — ~8 bytes/row
    through the exchange instead of full n-grams (collision odds ~n²/2⁶⁴)."""
    return df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("g0")
    ).select("id", F.xxhash64("g0").alias("g"))


def _cap_hot_shingles(ex: DataFrame, ndocs_df: DataFrame, max_shingle_df, min_cap: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds the cap — the standard
    corpus-scale guard: one stop-gram shared by 10% of docs otherwise turns
    the inverted-index self-join quadratic. The df computation groups on the
    same key as the join, so it reuses the exchange partitioning."""
    if max_shingle_df is None:
        return ex
    if isinstance(max_shingle_df, float):
        ndocs = ndocs_df.count()  # one count job; metadata-scale at any SF
        cap = max(int(max_shingle_df * ndocs), min_cap)
    else:
        cap = int(max_shingle_df)
    # the HOT set is small by construction (few shingles exceed the cap), so
    # anti-join against it — AQE turns this into a broadcast, adding no
    # shuffle of the index itself
    hot = ex.groupBy("g").agg(F.count(F.lit(1)).alias("__df__")).filter(
        F.col("__df__") > cap
    )
    return ex.join(hot.select("g"), on="g", how="left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_df: "float | int | None" = 0.01,
    min_shingle_df_cap: int = 20,
) -> DataFrame:
    """Exact n-gram-Jaccard duplicate pairs via inverted-index self-join.

    Plan: explode shingles → drop hot shingles (document frequency above
    ``max_shingle_df``·N, floored at ``min_shingle_df_cap`` — bounds the
    worst-case candidate blowup from stop-grams) → join on shingle (only
    co-shingled pairs materialize) → exact verify on the candidates with
    the FULL shingle sets, so the reported Jaccard is exact regardless of
    the cap. A qualifying pair is missed only if every shingle it shares is
    hot — near-dups share mostly doc-specific shingles, so recall loss is
    nil in practice (and ``max_shingle_df=None`` disables the cap).
    Output: id_a, id_b (a<b), jaccard_e4 (int, ×10⁴ — exact cross-engine).
    """
    sh = (
        df.select(F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
    )
    ex = _cap_hot_shingles(
        _shingle_index(df, n, text_col, id_col), df, max_shingle_df, min_shingle_df_cap
    )
    a = ex.select(F.col("id").alias("id_a"), "g")
    b = ex.select(F.col("id").alias("id_b"), "g")
    cands = (
        a.join(b, on="g")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return _verify_jaccard(cands, sh, threshold)


def _verify_jaccard(cands: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Exact shingle-set Jaccard over candidate pairs only (no all-pairs)."""
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("na"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("nb"))
    return (
        cands.join(a, on="id_a")
        .join(b, on="id_b")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard_e4",
            F.floor((F.col("shared") * 10000) / (F.col("na") + F.col("nb") - F.col("shared"))).cast("long"),
        )
        .filter(F.col("jaccard_e4") >= int(threshold * 10000))
        .select("id_a", "id_b", "jaccard_e4")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<long>) — m independent minhashes per document.

    One explode + one groupBy(id) with m min() aggregates: a single
    shuffle keyed on id, carrying only (id, m×8 bytes)."""
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(_shingles(text_col, n)).alias("g0")
    ).select("id", F.xxhash64("g0").alias("g"))
    # hash family: one string hash per shingle, then m cheap (seed, h) long
    # hashes — never m string hashes per shingle
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("g"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: "int | None" = 1000,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs, verified with exact Jaccard.

    banding: b=16 bands × r=4 rows ⇒ candidate-capture probability
    1-(1-j^r)^b (≈0.98 at j=0.7). Candidates come from a groupBy on
    (band, band-hash) buckets — never an all-pairs join — then are
    verified exactly (shingle-set Jaccard) so the output has no false
    positives. Buckets larger than ``max_bucket_size`` are dropped before
    the self-join (a k-doc bucket emits k²/2 candidates; at corpus scale a
    degenerate bucket is a quadratic blowup). Run :func:`dedup_exact`
    first — clusters of byte-identical documents land every band in the
    same bucket and are exact-dedup's job, not LSH's.
    Output: id_a, id_b, jaccard_e4.
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.col("sig")[i * r + j].cast("string") for j in range(r)])
                        ).alias("bh"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band", "b.bh")
    if max_bucket_size is not None:
        small = (
            banded.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__sz__"))
            .filter(F.col("__sz__") <= int(max_bucket_size))
        )
        banded = banded.join(small.select("band", "bh"), on=["band", "bh"])
    left = banded.select(F.col("id").alias("id_a"), "band", "bh")
    right = banded.select(F.col("id").alias("id_b"), "band", "bh")
    cands = (
        left.join(right, on=["band", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify on the candidate set only
    sh = df.select(
        F.col(id_col).alias("id"), _shingles(text_col, n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    return _verify_jaccard(cands, sh, threshold)


_SIMHASH_BITS = 64
_SIMHASH_CHUNKS = 4


def _simhash_batch(texts: pd.Series) -> pd.Series:
    """Fully-vectorized 64-bit simhash over word tokens, per Arrow batch.

    No per-word Python: ONE ``pd.util.hash_array`` call hashes every word
    in the batch (cython siphash with a fixed key — deterministic across
    runs, processes, and machines), ``np.unpackbits`` expands the bit
    planes, and ``np.add.reduceat`` at per-doc offsets produces the
    per-bit majority sums. ~2.3× the per-word-blake2b loop this replaced,
    with identical map-only plan shape.
    """
    word_lists = [str(t).lower().split() for t in texts]
    lens = np.array([len(w) for w in word_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    nz = lens > 0
    if nz.any():
        all_words = np.array([w for wl in word_lists for w in wl], dtype=object)
        hs = pd.util.hash_array(all_words)  # uint64, deterministic fixed key
        bits = np.unpackbits(hs[:, None].view(np.uint8), axis=1, bitorder="little")
        if lens.max() > 254:  # reduceat in uint8 would wrap at 256 words
            bits = bits.astype(np.int16)
        offsets = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        sums = np.add.reduceat(bits, offsets[nz])
        v = (sums.astype(np.int64) * 2 >= lens[nz][:, None]).astype(np.uint64)
        out[nz] = (v << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pd.Series(out.astype(np.int64))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket_size: "int | None" = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: per-row simhash (map-only vectorized pandas
    UDF), 16-bit chunk banding (hamming ≤ 3 over 4 chunks ⇒ some chunk
    matches exactly), popcount verify. Chunk buckets larger than
    ``max_bucket_size`` are dropped before the self-join (same quadratic
    guard as the MinHash band join; byte-identical clusters belong to
    :func:`dedup_exact`). Output: id_a, id_b, hamming.
    """
    sim_udf = F.pandas_udf(_simhash_batch, "long")
    s = df.select(F.col(id_col).alias("id"), sim_udf(F.col(text_col)).alias("sh"))
    chunks = s.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sh"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ch"),
                    )
                    for c in range(_SIMHASH_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk", "c.ch")
    if max_bucket_size is not None:
        small = (
            chunks.groupBy("chunk", "ch")
            .agg(F.count(F.lit(1)).alias("__sz__"))
            .filter(F.col("__sz__") <= int(max_bucket_size))
        )
        chunks = chunks.join(small.select("chunk", "ch"), on=["chunk", "ch"])
    left = chunks.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"), "chunk", "ch")
    right = chunks.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"), "chunk", "ch")
    cands = (
        left.join(right, on=["chunk", "ch"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
