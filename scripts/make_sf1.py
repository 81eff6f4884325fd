"""Synthesize an sf1 dataset (10x sf0.1) for scaling benchmarks.

The driver ships sf0.001/0.01/0.1 only; r1's bench showed the sf0.1 ratio
is dominated by fixed per-job overhead, so BENCH also needs a point an
order of magnitude up to show how the ratio scales. This replicates sf0.1
ten times with key-domain offsets so join fanouts and group sizes are
preserved exactly:

* fact/dim keys get per-replica strides (customer<->orders<->lineitem and
  part/supplier links stay consistent within each replica)
* region/nation stay as-is (real dims don't grow with sf)
* documents: every word in replica i>0 is prefixed ``r{i}_`` so replicas
  share NO shingles — near-dup structure scales linearly instead of
  creating artificial 10-doc duplicate clusters
* embeddings: replica i rotates the vector by i positions — norm
  preserved, direction changed, so cosine near-dup structure also scales
  linearly

Output: /root/repo/.data/sf1/*.parquet (gitignored). Deterministic.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".data", "sf1")
REPS = 10


def make_sf1(src: str = SRC, dst: str = DST, reps: int = REPS) -> str:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT unnest(range({reps})) AS i")

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def stride(table: str, key: str) -> int:
        return con.sql(f"SELECT max({key}) + 1 FROM {t(table)}").fetchone()[0]

    sc = stride("customer", "c_custkey")
    so = stride("orders", "o_orderkey")
    sp = stride("part", "p_partkey")
    ss = stride("supplier", "s_suppkey")
    se = stride("events", "event_id")
    su = stride("events", "user_id")
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")

    def copy(name: str, sql: str) -> None:
        out = f"{dst}/{name}.parquet"
        con.sql(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")

    for dim in ("region", "nation"):
        copy(dim, f"SELECT * FROM {t(dim)}")

    copy(
        "customer",
        f"SELECT c_custkey + i*{sc} AS c_custkey, * EXCLUDE (c_custkey) "
        f"FROM {t('customer')} CROSS JOIN r",
    )
    copy(
        "supplier",
        f"SELECT s_suppkey + i*{ss} AS s_suppkey, * EXCLUDE (s_suppkey) "
        f"FROM {t('supplier')} CROSS JOIN r",
    )
    copy(
        "part",
        f"SELECT p_partkey + i*{sp} AS p_partkey, * EXCLUDE (p_partkey) "
        f"FROM {t('part')} CROSS JOIN r",
    )
    copy(
        "orders",
        f"SELECT o_orderkey + i*{so} AS o_orderkey, o_custkey + i*{sc} AS o_custkey, "
        f"* EXCLUDE (o_orderkey, o_custkey) FROM {t('orders')} CROSS JOIN r",
    )
    copy(
        "lineitem",
        f"SELECT l_orderkey + i*{so} AS l_orderkey, l_partkey + i*{sp} AS l_partkey, "
        f"l_suppkey + i*{ss} AS l_suppkey, * EXCLUDE (l_orderkey, l_partkey, l_suppkey) "
        f"FROM {t('lineitem')} CROSS JOIN r",
    )
    copy(
        "events",
        f"SELECT event_id + i*{se} AS event_id, user_id + i*{su} AS user_id, "
        f"* EXCLUDE (event_id, user_id) FROM {t('events')} CROSS JOIN r",
    )
    copy(
        "documents",
        f"SELECT doc_id + i*{sd} AS doc_id, "
        "CASE WHEN i = 0 THEN text ELSE regexp_replace(text, '(\\S+)', 'r' || i || '_\\1', 'g') END AS text, "
        "lang, source, "
        "CASE WHEN i = 0 THEN n_chars ELSE length(regexp_replace(text, '(\\S+)', 'r' || i || '_\\1', 'g')) END AS n_chars "
        f"FROM {t('documents')} CROSS JOIN r",
    )
    # rotate by i MOD dim: for reps > dim a raw i would slice past the
    # vector end and emit ragged vectors (replicas i and i+dim then share a
    # direction — acceptable for scaling measurements, unreachable at the
    # default reps=10)
    row = con.sql(
        f"SELECT len(embedding) FROM {t('embeddings')} "
        "WHERE embedding IS NOT NULL LIMIT 1"
    ).fetchone()
    dim = row[0] if row is not None else None
    if not dim:
        # empty table or all-NULL vectors: nothing to rotate
        copy("embeddings", f"SELECT vec_id + i*{sv} AS vec_id, embedding, label FROM {t('embeddings')} CROSS JOIN r")
    else:
        copy(
            "embeddings",
            f"SELECT vec_id + i*{sv} AS vec_id, "
            f"CASE WHEN i % {dim} = 0 THEN embedding "
            f"ELSE (embedding[(i % {dim})+1:] || embedding[1:(i % {dim})])::FLOAT[] END AS embedding, label "
            f"FROM {t('embeddings')} CROSS JOIN r",
        )
    con.close()
    return dst


if __name__ == "__main__":
    out = make_sf1()
    sizes = {
        f: round(os.path.getsize(os.path.join(out, f)) / 1e6, 1)
        for f in sorted(os.listdir(out))
    }
    print(out, sizes)
