"""Deterministic transcendentals from IEEE elementary ops only.

libm ``exp``/``log``/``log2`` are not IEEE-754-specified: the JVM and
another engine's libm may disagree by 1 ulp, and when a result feeds a
fixed-point quantization (``floor(x·10⁶ + 0.5)``) a 1-ulp input flip at a
boundary flips the stored digit — a silent cross-engine hash mismatch
(measured: Spark log2 vs DuckDB log2 disagree on ~1 in 10⁴ integer
inputs after quantization). Elementary +,*,/ ARE exactly specified, so a
polynomial built from them is bit-identical on every engine that mirrors
the operation order.

Each Spark ``Column`` builder here has a ``*_sql`` twin generating the
identical operation sequence as SQL text — keep them adjacent and edit
them together; the cross-engine guarantee is exactly their agreement.

Accuracy is secondary to determinism (both engines get the SAME value by
construction) but is still good: ≈5e-9 relative for ``det_exp`` on
|x| ≤ 4, ≈1e-12 relative for ``det_log2_int``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# double(1/ln 2) — a LITERAL, so both engines see the same 64 bits
INV_LN2 = 1.4426950408889634


def det_exp(x: Column, squarings: int = 6) -> Column:
    """exp(x): 5-term Taylor at x/2^squarings, then repeated squaring."""
    u = x / F.lit(float(2**squarings))
    u2 = u * u
    u3 = u2 * u
    u4 = u3 * u
    u5 = u4 * u
    t = (
        F.lit(1.0)
        + u
        + u2 / F.lit(2.0)
        + u3 / F.lit(6.0)
        + u4 / F.lit(24.0)
        + u5 / F.lit(120.0)
    )
    for _ in range(squarings):
        t = t * t
    return t


def det_exp_fold(x: Column, squarings: int = 6) -> Column:
    """``det_exp`` with the squarings folded through ``F.aggregate``
    instead of unrolled — BIT-IDENTICAL values by construction (the
    fold performs the same ``t := t·t`` doubles in the same order; the
    lambda's ``acc`` is a variable reference, so nothing about the
    arithmetic changes), pinned against the unrolled form over a 100k
    grid and by tests/test_logreg.py::test_fit_matches_literal_iteration.

    Why two forms (r15, measured): the unrolled ``t = t * t`` DOUBLES
    the expression tree per squaring (×64 at the default 6), and every
    plan/codegen walk pays the expanded tree — ~2 s per *planning* of a
    small aggregate. The fold keeps the tree tiny (fast to plan) but
    evaluates through the interpreted higher-order-function path —
    ~6× slower PER ROW at 10M rows. So: use the FOLD in driver-side
    iterative loops over bounded/sampled inputs (logreg_fit — one new
    plan per iteration, planning-bound), keep the UNROLLED form for
    scan-scale scoring (one plan, billions of rows, codegen-bound).
    Crossover measured at roughly 10M rows per evaluation."""
    u = x / F.lit(float(2**squarings))
    u2 = u * u
    u3 = u2 * u
    u4 = u3 * u
    u5 = u4 * u
    t = (
        F.lit(1.0)
        + u
        + u2 / F.lit(2.0)
        + u3 / F.lit(6.0)
        + u4 / F.lit(24.0)
        + u5 / F.lit(120.0)
    )
    return F.aggregate(
        F.array_repeat(F.lit(0.0), squarings), t, lambda acc, _: acc * acc
    )


def det_exp_sql(x: str, squarings: int = 6) -> str:
    """DuckDB twin of ``det_exp`` — identical operation order; the
    squarings fold via list_reduce so the SQL text stays linear."""
    u = f"(({x}) / {float(2 ** squarings)})"
    taylor = (
        f"(1.0 + {u} + ({u}*{u})/2.0 + (({u}*{u})*{u})/6.0"
        f" + ((({u}*{u})*{u})*{u})/24.0"
        f" + (((({u}*{u})*{u})*{u})*{u})/120.0)"
    )
    zeros = ", ".join("CAST(0 AS DOUBLE)" for _ in range(squarings))
    return (
        f"list_reduce(list_prepend({taylor}, [{zeros}]),"
        f" (acc, z) -> acc * acc)"
    )


_ODD = list(range(3, 22, 2))  # atanh series exponents 3..21


def det_log2_int(c: Column) -> Column:
    """log2 of a POSITIVE integer column.

    Exact range reduction first — e = bit_length - 1 via the binary
    string, m = c / 2^e via shiftleft (both integer-exact, and division
    by a power of two is IEEE-exact) — leaves m ∈ [1, 2). Then
    ln(m) = 2·atanh(z), z = (m-1)/(m+1) ∈ [0, 1/3], as an 11-term odd
    series, and log2 = e + ln(m)·(1/ln 2) with the literal constant."""
    e = (F.length(F.bin(c)) - F.lit(1)).cast("int")
    pow2 = F.call_function(
        "shiftleft", F.lit(1).cast("long"), e
    ).cast("double")
    m = c.cast("double") / pow2
    z = (m - F.lit(1.0)) / (m + F.lit(1.0))
    z2 = z * z
    # Horner in z²: atanh(z) = z·(1 + z²·(1/3 + z²·(1/5 + …)))
    h: Column = F.lit(1.0 / _ODD[-1])
    for k in reversed(_ODD[:-1]):
        h = F.lit(1.0 / k) + z2 * h
    s = z * (F.lit(1.0) + z2 * h)
    return e.cast("double") + (F.lit(2.0) * s) * F.lit(INV_LN2)


def det_log2_int_sql(x: str) -> str:
    """DuckDB twin of ``det_log2_int`` — identical operation order (the
    1/k Horner constants are emitted via repr() of the same Python
    double on both sides, so the literals parse to the same bits)."""
    e = f"(length(bin({x})) - 1)"
    pow2 = f"CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE)"
    m = f"(CAST({x} AS DOUBLE) / {pow2})"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    h = repr(1.0 / _ODD[-1])
    for k in reversed(_ODD[:-1]):
        h = f"({1.0 / k!r} + {z2} * {h})"
    s = f"({z} * (1.0 + {z2} * {h}))"
    return f"(CAST({e} AS DOUBLE) + (2.0 * {s}) * {INV_LN2!r})"
