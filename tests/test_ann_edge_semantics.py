"""Edge-semantics pins for the r14 ADVICE items on the BLAS ANN paths.

Covers:
* `_round6_int_micro` == a live DuckDB `round(x, 6)` bit-for-bit on a
  boundary battery (the parity gate's actual oracle semantics — Spark's
  own F.round takes the BigDecimal shortest-repr path and diverges in
  the half-ulp class, which is the pre-existing class every rounded
  catalog column carries).
* `_assign_cells` zero-divisor semantics: a zero-norm CENTROID (or
  vector) is NULL in both engine forms and must rank LAST, while a
  genuine NaN input ranks FIRST — each checked against the relational
  Spark crossJoin+window form the BLAS path replaced.
* `pq._sub_d2` sequential-fold association == a pure-Python left fold
  (the aggregate/list_reduce association), bit-for-bit.
* `pq_adc_topk` with an EMPTY query set returns an empty, correctly
  typed frame instead of raising in the executor.
* `srp_signature_bit` int64 arithmetic: no 32-bit wrap at plane
  counts/dims where plane·d·65537 exceeds 2^31.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    vectors as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    pq as PQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    similarity as SIM,
)


def test_round6_micro_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")
    rng = random.Random(14)
    vals = [
        0.9999995,
        -0.9999995,
        0.9999994999999999,
        -0.9999994999999999,
        0.1234565,
        0.1234575,
        5e-07,
        -5e-07,
        2.5e-07,
        7.499999999999999e-07,
        0.0,
        1.0,
        -1.0,
        1.0000000000000002,
    ] + [rng.uniform(-1, 1) for _ in range(500)] + [
        # values engineered onto the k + 0.5 scaled boundary
        (k + 0.5) / 1e6
        for k in (0, 1, 123456, 999998, 999999)
    ]
    con = duckdb.connect()
    got = SIM._round6_int_micro(np.array(vals, dtype=np.float64))
    for v, micro in zip(vals, got):
        d = con.sql(
            "SELECT round(CAST(? AS DOUBLE), 6)", params=[v]
        ).fetchone()[0]
        assert micro / 1e6 == d, (v, micro, d)


def _relational_assign(vecs, cents, keep):
    """The crossJoin + expression-cosine + window form `_assign_cells`
    replaced — collected under ANSI OFF so x/0.0 yields NULL (the
    DuckDB oracle's and classic-Spark semantics; Spark 4's ANSI
    default otherwise raises DIVIDE_BY_ZERO on zero norms)."""
    spark = vecs.sparkSession
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        w = Window.partitionBy("id").orderBy(
            F.col("cos").desc(), F.col("cent_id")
        )
        df = (
            vecs.crossJoin(cents)
            .withColumn(
                "cos", F.round(V.cosine(F.col("v"), F.col("cent_v")), 6)
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= keep)
            .select("id", F.col("cent_id").alias("cell"), "r")
        )
        return df.collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def _duckdb_assign(vec_rows, cent_rows, keep):
    """The parity gate's actual oracle shape (see _IVF_SQL in
    plans/catalog.py) replayed on literal rows."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    vv = ", ".join(f"({i}, {list(map(float, v))})" for i, v in vec_rows)
    cc = ", ".join(
        f"({i}, {list(map(float, v))})" for i, v in cent_rows
    )
    return set(
        map(
            tuple,
            con.sql(
                f"""
    WITH v(id, v) AS (VALUES {vv}),
    c(cent_id, cent_v) AS (VALUES {cc}),
    terms AS (SELECT id, cent_id, unnest(v) AS x, unnest(cent_v) AS y
              FROM v CROSS JOIN c),
    cos AS (SELECT id, cent_id,
                   round(sum(x*y)/(sqrt(sum(x*x))*sqrt(sum(y*y))), 6) AS cc
            FROM terms GROUP BY id, cent_id)
    SELECT id, cent_id FROM (
      SELECT id, cent_id,
             row_number() OVER (PARTITION BY id ORDER BY cc DESC, cent_id) AS r
      FROM cos) WHERE r <= {keep}
    """
            ).fetchall(),
        )
    )


def _frames(spark):
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.6, 0.8]),
            (3, [0.0, 0.0]),  # zero-norm vector
        ],
        "id long, v array<double>",
    )
    cents = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),  # zero-norm centroid
            (5, [2.0, 0.0]),
            (7, [0.0, 3.0]),
        ],
        "cent_id long, cent_v array<double>",
    )
    return vecs, cents


@pytest.mark.parametrize("keep", [1, 2, 3])
def test_assign_cells_zero_norms_match_relational_form(spark, keep):
    vecs, cents = _frames(spark)
    got = {
        (r["id"], r["cell"])
        for r in SIM._assign_cells(vecs, cents, keep).collect()
    }
    want = {
        (r["id"], r["cell"])
        for r in _relational_assign(vecs, cents, keep)
    }
    assert got == want
    # and the gate's real oracle agrees
    want_duck = _duckdb_assign(
        [(r["id"], r["v"]) for r in vecs.collect()],
        [(r["cent_id"], r["cent_v"]) for r in cents.collect()],
        keep,
    )
    assert got == want_duck
    if keep == 1:
        # the zero-norm centroid must NOT capture real vectors (the
        # pre-r14 NaN-first branch assigned every vector to cell 0)
        assert (1, 5) in got and (2, 7) in got
        # a zero-norm vector ties all-NULL -> lowest cent_id
        assert (3, 0) in got
    if keep == 2:
        assert (1, 0) not in got and (2, 0) not in got


def test_assign_cells_nan_input_ranks_first(spark):
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.6, 0.8])], "id long, v array<double>"
    )
    cents = spark.createDataFrame(
        [(4, [float("nan"), 1.0]), (5, [2.0, 0.0]), (7, [0.0, 3.0])],
        "cent_id long, cent_v array<double>",
    )
    got = {
        (r["id"], r["cell"])
        for r in SIM._assign_cells(vecs, cents, 1).collect()
    }
    want = {
        (r["id"], r["cell"]) for r in _relational_assign(vecs, cents, 1)
    }
    assert got == want
    # NaN sorts greatest in both engines: the NaN centroid wins
    assert got == {(1, 4), (2, 4)}


def test_sub_d2_matches_sequential_left_fold():
    rng = np.random.default_rng(14)
    s = rng.uniform(-1, 1, size=(64, 8))
    cb = rng.uniform(-1, 1, size=(16, 8))
    got = PQ._sub_d2(s, cb)
    for i in range(s.shape[0]):
        for c in range(cb.shape[0]):
            acc = 0.0
            for t in range(s.shape[1]):
                d = s[i, t] - cb[c, t]
                acc = acc + d * d
            assert got[i, c] == acc, (i, c)


def test_pq_adc_topk_empty_queries_returns_empty(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i % 3), float(i % 5)] * 4) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    books = PQ.pq_codebooks_head(corpus, m=2, k_codes=4)
    codes = PQ.pq_encode(corpus, books)
    empty_q = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    out = PQ.pq_adc_topk(spark, empty_q, codes, books, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "qid",
        "cid",
        "adc_d2",
        "rank",
    ]
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
        "bigint",
        "int",
    ]


def test_srp_signature_bit_no_int32_wrap_at_deep_planes(spark):
    # plane=600 x dim up to 699: plane*d*65537 > 2^31, where the
    # pre-r14 IntegerType arithmetic wrapped; the int64 form must match
    # the numpy int64 family (same as the sig_batches twin / BIGINT
    # oracles)
    dim, plane = 700, 600
    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(8)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r["id"]: r["bit"]
        for r in df.select(
            "id", SIM.srp_signature_bit(F.col("v"), plane).alias("bit")
        ).collect()
    }
    d = np.arange(dim, dtype=np.int64)
    h = np.where(
        ((plane * 7919 + d * 104729 + plane * d * 65537) % 1000003) % 2
        == 0,
        1.0,
        -1.0,
    )
    for i, v in rows:
        # sequential fold like F.aggregate
        acc = 0.0
        for t in range(dim):
            acc = acc + v[t] * h[t]
        assert got[i] == (1 if acc >= 0 else 0), i
        # far from the sign boundary at these magnitudes
        assert abs(acc) > 1e-9
