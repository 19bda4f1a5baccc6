"""Mergeable distinct-count sketches (KMV — k minimum values).

The 100 TB shape for COUNT(DISTINCT x) maintenance: exact distinct
needs a shuffle of every distinct value per group, every time. A KMV
sketch keeps only the k smallest hash values per group — k·8 bytes of
state however many distinct values exist — and is MERGEABLE with no
error growth: the k smallest hashes of A ∪ B are a subset of
(k smallest of A) ∪ (k smallest of B), so unions of sketches are
EXACTLY the sketch of the union. That makes per-partition, per-day, or
per-batch sketches composable into rollups without touching raw data
again (the same algebra Delta/Iceberg engines use for NDV stats, and
the textbook KMV estimator of Bar-Yossef et al.).

Estimator: with U_k = (k-th smallest hash)/2^32, distinct ≈ (k−1)/U_k;
groups holding fewer than k distinct hashes are EXACT (the sketch has
every hash). Standard error ≈ 1/√(k−2).

Hash family: the repo's engine-portable md5 discipline
(functions/hashing.py) — the first 8 hex chars as a 32-bit integer —
so a SQL oracle reproduces the sketch AND the estimate bit-for-bit
(IEEE division of identical integers). Deterministic by construction:
no RNG, no partitioning sensitivity.

Plan shape: one distinct on (group, hash) — map-side combined — then a
bounded per-group top-k window. No collect, no unbounded state.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_SPACE = 2**32  # 8 hex chars = 32-bit hash values


def h32(col: Column) -> Column:
    """Engine-portable 32-bit hash: first 8 hex chars of md5, as long.
    (DuckDB twin: per-digit strpos expansion — see the catalog SQL.)"""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 8), 16, 10
    ).cast("long")


def _kmv_trim(hashes: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Shared trim: keep each key's k smallest NON-NULL hashes. The
    NULL filter is semantics, not hygiene — COUNT(DISTINCT) ignores
    NULLs, and an unfiltered NULL hash would sort FIRST in this window,
    permanently occupying a sketch slot through every future merge
    (NULL can never be evicted by a smaller value)."""
    w = Window.partitionBy(*keys).orderBy("h")
    return (
        hashes.filter(F.col("h").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*keys, "h")
    )


def kmv_sketch(
    df: DataFrame, keys: list[str], col: str, k: int = 64
) -> DataFrame:
    """Per-key KMV sketch rows: (keys..., h) — the k smallest distinct
    32-bit hashes of ``col`` (NULL values ignored, matching
    COUNT(DISTINCT)). One (keys, h) distinct (partial aggregation
    combines map-side) + one bounded window."""
    return _kmv_trim(
        df.select(*keys, h32(F.col(col)).alias("h")).distinct(), keys, k
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, keys: list[str], k: int = 64
) -> DataFrame:
    """Union two sketches into the sketch of the underlying union —
    exact, not approximate: the union's k smallest hashes all survive
    in one of the inputs. This is the incremental-maintenance step
    (yesterday's sketch ⊎ today's batch sketch, no raw-data rescan)."""
    return _kmv_trim(
        a.select(*keys, "h").unionByName(b.select(*keys, "h")).distinct(),
        keys,
        k,
    )


def kmv_estimate(
    sketch: DataFrame, keys: list[str], k: int = 64, round_to: int = 4
) -> DataFrame:
    """(keys..., est_distinct): exact count when the group holds fewer
    than k hashes (the sketch IS the distinct set), else the KMV
    estimator (k−1)·2³²/h_k, rounded for cross-engine determinism."""
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
    )
    return agg.select(
        *keys,
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(KMV_SPACE))
                / F.greatest(F.col("_hk"), F.lit(1)),
                round_to,
            )
        )
        .alias("est_distinct"),
    )


def kmv_intersect_estimate(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    k: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Sketch-level set algebra (Bar-Yossef / Beyer et al.): from two
    per-key KMV sketches, estimate (keys..., est_union, est_intersect,
    est_jaccard) WITHOUT touching raw data — the 100 TB shape for
    cross-corpus overlap/contamination estimation, where materializing
    either distinct set (let alone their intersection) would shuffle
    every value.

    Method: the merged sketch S (k smallest of A's ∪ B's hashes) is a
    uniform sample of the union's hash space. ρ = |S ∩ A ∩ B| / |S|
    estimates the Jaccard similarity, and ρ · est(|A∪B|) the
    intersection size. When the union holds fewer than k distinct
    hashes every quantity is EXACT (the sketches are complete sets and
    ρ·n collapses to the true intersection count). Division/rounding
    follow the same IEEE discipline as ``kmv_estimate`` so a SQL
    oracle reproduces the floats bit-for-bit.

    Plan shape: two sketch-sized semi-joins + one bounded groupBy —
    inputs are k rows per group, so this is manifest-scale work
    regardless of corpus size. Standard error ~ 1/√k on ρ."""
    def ns_join(left: DataFrame, right: DataFrame, cols, how: str):
        # null-safe equi-join (<=> keys): a NULL-keyed group matches its
        # own sketch rows instead of silently dropping out of semi/left
        # joins — same discipline as operators/incremental._ns_join
        r = right
        for c in cols:
            r = r.withColumnRenamed(c, "__r_" + c)
        cond = reduce(
            lambda x, y: x & y,
            [F.col(c).eqNullSafe(F.col("__r_" + c)) for c in cols],
        )
        return left.join(r, cond, how)

    merged = kmv_merge(a, b, keys, k)
    both = (
        ns_join(
            ns_join(
                merged, a.select(*keys, "h").distinct(),
                [*keys, "h"], "left_semi",
            ),
            b.select(*keys, "h").distinct(),
            [*keys, "h"],
            "left_semi",
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    stats = merged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
    )
    est_union = (
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(
            F.round(
                F.lit(float(k - 1))
                * F.lit(float(KMV_SPACE))
                / F.greatest(F.col("_hk"), F.lit(1)),
                round_to,
            )
        )
    )
    rho = F.coalesce(F.col("_c"), F.lit(0)).cast("double") / F.col("_n")
    return (
        ns_join(stats, both, keys, "left")
        .withColumn("est_union", est_union)
        .select(
            *keys,
            "est_union",
            F.round(rho * F.col("est_union"), round_to).alias(
                "est_intersect"
            ),
            F.round(rho, 6).alias("est_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram quantile sketch: the mergeable AND delete-capable
# companion to KMV. State per group is one counter per occupied bin —
# merge is bin-wise addition (exact algebra, like KMV), and unlike any
# order-statistics sketch it supports DELETES (counters decrement), so a
# CDC feed can maintain per-group quantile estimates forever without a
# rescan. The estimator is deterministic (bin midpoint at the target
# cumulative rank) with error bounded by half the bin width — chosen by
# the caller in fixed-point units, the repo's cross-engine discipline.
# ---------------------------------------------------------------------------


def hist_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    bin_width: int,
    scale: int = 100,
) -> DataFrame:
    """(keys..., bin, cnt): fixed-width histogram of ``col`` quantized
    to ``scale`` fixed-point then bucketed by ``bin_width`` (same
    units). NULL values are ignored, matching how every SQL aggregate
    (and the delta path below) treats them — a NULL bin would also
    order differently across engines (Spark NULLS FIRST vs DuckDB
    NULLS LAST) and silently shift cumulative quantile targets. One
    map-side-combined groupBy — no sort, no collect."""
    fx = F.floor(F.col(col) * scale + F.lit(0.5)).cast("long")
    return (
        df.select(*keys, F.floor(fx / bin_width).cast("long").alias("bin"))
        .filter(F.col("bin").isNotNull())
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_deltas(
    changes: DataFrame,
    keys: list[str],
    bin_width: int,
    op_col: str = "op",
    old_val: str = "old_val",
    new_val: str = "new_val",
    scale: int = 100,
) -> DataFrame:
    """Per-(key, bin) count deltas from a CDC batch (op ∈ {I,U,D} with
    pre/post images) — the quantile-sketch analog of
    incremental.agg_deltas. One shuffle, on the batch only."""
    fx_new = F.floor(F.col(new_val) * scale + F.lit(0.5)).cast("long")
    fx_old = F.floor(F.col(old_val) * scale + F.lit(0.5)).cast("long")
    new_bin = F.floor(fx_new / bin_width).cast("long")
    old_bin = F.floor(fx_old / bin_width).cast("long")
    added = changes.filter(F.col(op_col).isin("I", "U")).select(
        *keys, new_bin.alias("bin"), F.lit(1).alias("_d")
    )
    removed = changes.filter(F.col(op_col).isin("D", "U")).select(
        *keys, old_bin.alias("bin"), F.lit(-1).alias("_d")
    )
    return (
        added.unionByName(removed)
        # NULL images bucket nowhere (hist_sketch ignores NULL values;
        # a NULL-bin counter would be silent, irreversible state
        # corruption that no rebuild could reproduce)
        .filter(F.col("bin").isNotNull())
        .groupBy(*keys, "bin")
        .agg(F.sum("_d").alias("cnt"))
    )


def hist_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Bin-wise addition — merges two sketches OR applies a delta
    sketch to a base. union+groupBy is null-safe by construction (no
    join), so NULL-keyed groups merge correctly; emptied bins drop."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "bin")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def hist_quantiles(
    sketch: DataFrame,
    keys: list[str],
    qs: list[float],
    bin_width: int,
    scale: int = 100,
) -> DataFrame:
    """(keys..., q, est): deterministic quantile estimates — the
    midpoint of the first bin whose cumulative count reaches
    ceil(q·n) — error ≤ bin_width/(2·scale). One window over the
    group's occupied bins (bounded by value range / bin_width, not by
    row count)."""
    w = Window.partitionBy(*keys).orderBy("bin")
    wk = Window.partitionBy(*keys)
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wk)
    )
    out = None
    for q in qs:
        target = F.ceil(F.lit(q) * F.col("n"))
        hit = (
            cum.filter(F.col("cum") >= target)
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy(*keys).orderBy("bin")
                ),
            )
            .filter(F.col("rk") == 1)
            .select(
                *keys,
                F.lit(q).alias("q"),
                F.round(
                    (F.col("bin") * bin_width + bin_width / 2.0)
                    / scale,
                    6,
                ).alias("est"),
            )
        )
        out = hit if out is None else out.unionByName(hit)
    return out

# ---------------------------------------------------------------------------
# Count-Min sketch: the mergeable AND delete-capable FREQUENCY companion
# to KMV (distinct) and the histogram (quantiles). State per group is
# depth × width counters — independent of how many distinct items exist —
# merge is counter-wise addition (exact algebra) and a CDC feed maintains
# it with ±1 deltas, never a rescan (Cormode & Muthukrishnan 2005; the
# turnstile-stream setting is exactly the delete case). Point queries
# overestimate only: est(x) = min over rows of the counter x hashes to,
# error ≤ 2n/width with prob 1−2^−depth. Hash family is the repo's
# engine-portable md5 discipline (row-index-salted), so a SQL oracle
# reproduces every counter and every estimate bit-for-bit.
# ---------------------------------------------------------------------------


def _cm_bucket(val: Column, row: Column, width: int) -> Column:
    """Bucket of ``val`` under depth-row ``row``: md5-32 of
    "row:value" mod width. Salting the hash input with the row index
    gives depth pairwise-independent-enough functions from ONE md5 —
    and keeps the DuckDB twin a one-line string concat."""
    return (
        h32(F.concat(row.cast("string"), F.lit(":"), val.cast("string")))
        % width
    )


def _cm_rows(depth: int) -> Column:
    return F.explode(F.array(*[F.lit(r) for r in range(depth)]))


def cm_sketch(
    df: DataFrame,
    keys: list[str],
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-key Count-Min sketch rows: (keys..., row, bucket, cnt) —
    occupied counters only (absent counter ≡ 0). NULL items are
    ignored (COUNT(col) semantics — and a NULL hash input would bucket
    all rows identically, silently merging every NULL into one hot
    counter). One explode (depth× fan-out, map-side) + one
    map-side-combined groupBy — no window, no collect."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(*keys, _cm_rows(depth).alias("row"), F.col(col).alias("_v"))
        .select(
            *keys,
            "row",
            _cm_bucket(F.col("_v"), F.col("row"), width).alias("bucket"),
        )
        .groupBy(*keys, "row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_deltas(
    changes: DataFrame,
    keys: list[str],
    depth: int = 4,
    width: int = 256,
    op_col: str = "op",
    old_val: str = "old_val",
    new_val: str = "new_val",
) -> DataFrame:
    """Per-(key, row, bucket) counter deltas from a CDC batch
    (op ∈ {I,U,D} with pre/post images) — the turnstile update:
    inserts +1 on the new image's buckets, deletes −1 on the old
    image's, updates both. One shuffle, on the batch only; NULL images
    bucket nowhere (cm_sketch ignores NULL items)."""
    added = changes.filter(F.col(op_col).isin("I", "U")).select(
        *keys, F.col(new_val).alias("_v"), F.lit(1).alias("_d")
    )
    removed = changes.filter(F.col(op_col).isin("D", "U")).select(
        *keys, F.col(old_val).alias("_v"), F.lit(-1).alias("_d")
    )
    return (
        added.unionByName(removed)
        .filter(F.col("_v").isNotNull())
        .select(*keys, _cm_rows(depth).alias("row"), "_v", "_d")
        .select(
            *keys,
            "row",
            _cm_bucket(F.col("_v"), F.col("row"), width).alias("bucket"),
            "_d",
        )
        .groupBy(*keys, "row", "bucket")
        .agg(F.sum("_d").alias("cnt"))
    )


def cm_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Counter-wise addition — merges two sketches OR applies a delta
    sketch to a base. union+groupBy (no join) is null-safe for
    NULL-keyed groups by construction; zeroed counters drop so the
    state stays bounded by OCCUPIED counters."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .filter(F.col("cnt") != 0)
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    keys: list[str],
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a sketch for every (key, item) candidate pair:
    (keys..., col, est_cnt) with est_cnt = min over depth rows of the
    counter the item hashes to (missing counter = 0). Candidates come
    in as a DataFrame — at 100 TB the sketch is counter-bounded
    (depth·width per group) and the probe is an equi-join on
    (keys, row, bucket), so cost scales with |candidates|·depth, never
    with the sketched corpus. Estimates are exact overestimates:
    est ≥ true count always (counters only ever sum true occurrences
    plus collisions)."""
    probes = (
        items.filter(F.col(col).isNotNull())
        .select(*keys, F.col(col).alias("_v"))
        .distinct()
        .select(*keys, "_v", _cm_rows(depth).alias("row"))
        .select(
            *keys,
            "_v",
            "row",
            _cm_bucket(F.col("_v"), F.col("row"), width).alias("bucket"),
        )
    )
    sk = sketch
    for c in [*keys, "row", "bucket", "cnt"]:
        sk = sk.withColumnRenamed(c, "__s_" + c)
    cond = reduce(
        lambda x, y: x & y,
        [
            F.col(c).eqNullSafe(F.col("__s_" + c))
            for c in [*keys, "row", "bucket"]
        ],
    )
    return (
        probes.join(sk, cond, "left")
        .groupBy(*[F.col(c) for c in keys], F.col("_v").alias(col))
        .agg(
            F.min(F.coalesce(F.col("__s_cnt"), F.lit(0))).alias("est_cnt")
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog-style register sketch (Flajolet et al. 2007). Third
# distinct-count representation alongside KMV: where KMV keeps k hash
# VALUES (k·8 bytes, exact below k), HLL keeps 2^p fixed REGISTERS of
# one byte each — state is O(2^p) per group no matter the cardinality,
# and merge is register-wise max (idempotent, commutative, associative:
# re-delivered batches cannot corrupt it, which KMV shares but counters
# do not). The 100 TB shape: per-partition register sketches roll up
# into global NDV with a single map-side-combined max — no distinct
# shuffle, no window, no per-value state.
#
# Determinism discipline: the estimator is the RAW HLL harmonic mean
# only — alpha·m²/Σ2^(−M_j) — with the indicator sum computed in
# INTEGER space (Σ 2^(Q+1−M_j) as a BIGINT, missing registers
# contributing 2^(Q+1)) so the one floating division is IEEE-exact and
# a DuckDB oracle reproduces the estimate bit-for-bit. The small-range
# linear-counting correction is deliberately omitted (it needs ln(),
# i.e. libm, whose last-ulp behavior differs across engines); the
# valid regime is n ≳ 2.5·2^p — pick p against expected group
# cardinality, or use the KMV family when groups may be tiny and the
# exact-below-k path matters.
# ---------------------------------------------------------------------------

_HLL_ALPHA = {4: 0.673, 5: 0.697, 6: 0.709}


def hll_alpha(p: int) -> float:
    """Standard HLL bias-correction constant for m=2^p registers."""
    if p in _HLL_ALPHA:
        return _HLL_ALPHA[p]
    m = 1 << p
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame, keys: list[str], col: str, p: int = 6
) -> DataFrame:
    """Per-key HLL register rows: (keys..., reg, m) — occupied
    registers only (absent register ≡ 0). reg = top p bits of the
    md5-32 hash, m = max over values of rho(w) where w is the low
    Q=32−p bits and rho = leading-zero count in the Q-bit field + 1
    (bit length via base-2 string — Spark conv() and DuckDB bin()
    agree digit-for-digit). NULLs ignored (COUNT DISTINCT semantics).
    ONE map-side-combined groupBy — no distinct, no window: max() is
    idempotent, so duplicate values need no pre-dedup pass."""
    q = 32 - p
    h = h32(F.col(col))
    w = h % (1 << q)
    bitlen = F.when(w == 0, F.lit(0)).otherwise(
        F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.filter(F.col(col).isNotNull())
        .select(
            *keys,
            F.shiftright(h, q).alias("reg"),
            (F.lit(q + 1) - bitlen).alias("rho"),
        )
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("m"))
    )


def hll_merge(a: DataFrame, b: DataFrame, keys: list[str]) -> DataFrame:
    """Register-wise max — the sketch of the union, EXACTLY (each
    register's max survives in one input). Idempotent: merging a batch
    twice changes nothing, so at-least-once delivery is safe without
    any dedup bookkeeping. union+groupBy, no join — null-safe for
    NULL-keyed groups by construction."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "reg")
        .agg(F.max("m").alias("m"))
    )


def hll_estimate(
    sketch: DataFrame,
    keys: list[str],
    p: int = 6,
    round_to: int = 4,
) -> DataFrame:
    """(keys..., present_regs, est_distinct): the raw HLL estimator
    alpha·m²/Σ2^(−M_j). The indicator sum is kept integral —
    Σ 2^(Q+1−M_j) over occupied registers plus 2^(Q+1) per missing
    register, a BIGINT — so the single double division (a Python-float
    literal numerator over an exact integer) is reproduced bit-for-bit
    by the SQL oracle. present_regs is exact and doubles as a
    small-range diagnostic (estimates with present_regs ≪ m sit below
    the raw estimator's valid regime)."""
    q = 32 - p
    m_regs = 1 << p
    # alpha * m^2 * 2^(Q+1), folded to ONE literal so both engines
    # parse (correctly-rounded) the identical double.
    numer = hll_alpha(p) * float(m_regs) * float(m_regs) * float(1 << (q + 1))
    agg = sketch.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_present"),
        F.sum(F.expr(f"shiftleft(1L, {q + 1} - m)")).alias("_s_occ"),
    )
    s_total = F.col("_s_occ") + (F.lit(m_regs) - F.col("_present")) * F.lit(
        1 << (q + 1)
    ).cast("long")
    return agg.select(
        *keys,
        F.col("_present").alias("present_regs"),
        F.round(F.lit(numer) / s_total.cast("double"), round_to).alias(
            "est_distinct"
        ),
    )
