"""Cross-engine determinism of the transcendental replacements.

functions/detmath builds exp/log2 from IEEE +,*,/ only, so Spark and
DuckDB must agree BIT-FOR-BIT after fixed-point quantization — these
tests sweep large input ranges and assert zero mismatches (libm log2,
by contrast, measurably flips ~1 in 10^4 quantized integer terms
between the two engines). The ln-based operators (weighted sampling,
BM25, unigram logprob) still use libm ln: the audit test pins the
measured agreement of THIS engine pair so an upgrade that breaks it
fails here loudly instead of as a flaky driver hash row.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    detmath as DM,
)


def test_det_log2_int_bit_identical_across_engines(spark):
    n = 50_000
    s = [
        r["t"]
        for r in spark.range(1, n + 1)
        .select(
            F.floor(
                (F.col("id") * DM.det_log2_int(F.col("id"))) * 1000000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("t")
        )
        .collect()
    ]
    d = [
        r[0]
        for r in duckdb.sql(
            f"SELECT CAST(floor((i * {DM.det_log2_int_sql('i')}) * 1000000"
            f" + 0.5) AS BIGINT) FROM generate_series(1, {n}) AS t(i)"
            " ORDER BY i"
        ).fetchall()
    ]
    assert s == d
    # and it is an accurate log2: spot-check against libm
    import math

    for i in (2, 3, 10, 4097, 49999):
        assert abs(s[i - 1] / 1e6 - i * math.log2(i)) < 1e-4


def test_det_exp_bit_identical_across_engines(spark):
    # margins in the logreg operating range, eighth-steps over [-4, 4]
    s = [
        r["t"]
        for r in spark.range(-32, 33)
        .select(
            F.floor(
                F.lit(1000000.0)
                / (F.lit(1.0) + DM.det_exp(F.col("id") / F.lit(8.0)))
            )
            .cast("long")
            .alias("t")
        )
        .collect()
    ]
    d = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(floor(1000000.0 / (1.0 + "
            + DM.det_exp_sql("i / 8.0")
            + ")) AS BIGINT) FROM generate_series(-32, 32) AS t(i) ORDER BY i"
        ).fetchall()
    ]
    assert s == d


def test_libm_ln_agreement_audit(spark):
    """The A-ES sampling priority floor(-1e6·ln(u)/w) still uses libm ln
    on both engines; this pins the agreement over the full hash-derived
    u grid shape actually used (zero mismatches measured). If a JVM or
    DuckDB upgrade breaks libm agreement, this fails visibly."""
    knuth = 2654435761
    n = 50_000
    s = [
        r["p"]
        for r in spark.range(0, n)
        .select(
            F.floor(
                F.lit(-1e6)
                * F.log(
                    (
                        F.pmod(
                            F.col("id") * F.lit(knuth) + F.lit(104729),
                            F.lit(1 << 32),
                        )
                        + 1
                    )
                    / F.lit(float((1 << 32) + 2))
                )
                / ((F.col("id") % 7 + 1).cast("double"))
            )
            .cast("long")
            .alias("p")
        )
        .collect()
    ]
    d = [
        r[0]
        for r in duckdb.sql(
            f"""
SELECT CAST(floor(-1e6 * ln(((({knuth}::BIGINT * i + 104729) % 4294967296) + 1)
                            / 4294967298.0)
                  / CAST(i % 7 + 1 AS DOUBLE)) AS BIGINT)
FROM generate_series(0, {n - 1}) AS t(i) ORDER BY i
"""
        ).fetchall()
    ]
    assert s == d
