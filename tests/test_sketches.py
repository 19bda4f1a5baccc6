"""KMV distinct-count sketches: exact merge algebra (sketch of a union
equals the merge of the parts' sketches), exact small groups, bounded
estimator error, and partitioning invariance."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    sketches as SK,
)


def test_small_groups_are_exact_and_large_groups_bounded(spark):
    df = spark.range(5000).select(
        F.when(F.col("id") % 4 == 0, "big")
        .otherwise(F.concat(F.lit("small"), (F.col("id") % 3).cast("string")))
        .alias("g"),
        # big: 1250 distinct values; smallN: ~20 distinct each
        F.when(F.col("id") % 4 == 0, F.col("id"))
        .otherwise(F.col("id") % 20)
        .alias("v"),
    )
    est = {
        r["g"]: r["est_distinct"]
        for r in SK.kmv_estimate(
            SK.kmv_sketch(df, ["g"], "v", k=64), ["g"], k=64
        ).collect()
    }
    # sub-k groups are exact (the sketch IS the distinct set)
    for g in ("small0", "small1", "small2"):
        exact = (
            df.filter(F.col("g") == g).select("v").distinct().count()
        )
        assert est[g] == float(exact)
    # the big group estimates within ~3 standard errors (1/sqrt(62))
    assert abs(est["big"] - 1250) / 1250 < 0.4


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
)
def test_merge_of_sketches_equals_sketch_of_union(spark, xs, ys):
    """The exactness property that makes KMV state maintainable without
    rescans: merge(sketch(A), sketch(B)) == sketch(A ∪ B), row for row
    — including overlapping values and sub-k groups."""
    K = 8

    def frame(vals):
        if not vals:
            return spark.createDataFrame([], "g string, v long")
        return spark.createDataFrame(
            [("g", v) for v in vals], "g string, v long"
        )

    a, b = frame(xs), frame(ys)
    merged = {
        r["h"]
        for r in SK.kmv_merge(
            SK.kmv_sketch(a, ["g"], "v", k=K),
            SK.kmv_sketch(b, ["g"], "v", k=K),
            ["g"],
            k=K,
        ).collect()
    }
    direct = {
        r["h"]
        for r in SK.kmv_sketch(
            a.unionByName(b), ["g"], "v", k=K
        ).collect()
    }
    assert merged == direct


def test_sketch_is_partitioning_invariant(spark):
    df = spark.range(2000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") * 7919 % 997).alias("v"),
    )
    one = {
        (r["g"], r["h"])
        for r in SK.kmv_sketch(
            df.coalesce(1), ["g"], "v", k=32
        ).collect()
    }
    many = {
        (r["g"], r["h"])
        for r in SK.kmv_sketch(
            df.repartition(13), ["g"], "v", k=32
        ).collect()
    }
    assert one == many


def test_streaming_kmv_maintenance_exactly_once(spark, tmp_path):
    """Streamed sketch state equals the one-shot sketch of the full
    feed after every batch (the merge algebra in the streaming layer),
    with replay no-ops and fresh-checkpoint rebuild."""
    import os

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        read_maintained_kmv_estimate,
        stream_kmv_maintenance,
    )

    raw = str(tmp_path / "raw")
    state = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")

    def write(name, pairs):
        os.makedirs(raw, exist_ok=True)
        with open(os.path.join(raw, name), "w") as f:
            f.write("k,v\n")
            for g, v in pairs:
                f.write(f"{g},{v}\n")

    K = 8
    seen: dict[str, set] = {}
    batches = [
        [("a", f"u{i}") for i in range(30)] + [("b", "x"), ("b", "y")],
        [("a", f"u{i}") for i in range(20, 50)] + [("b", "x")],
        [("c", f"w{i}") for i in range(5)],
    ]
    for i, rows in enumerate(batches, start=1):
        write(f"b{i}.csv", rows)
        q = stream_kmv_maintenance(spark, raw, state, ckpt, kmv_k=K)
        q.awaitTermination(120)
        for g, v in rows:
            seen.setdefault(g, set()).add(v)
        got = {
            r["k"]: r["est_distinct"]
            for r in read_maintained_kmv_estimate(
                spark, state, kmv_k=K
            ).collect()
        }
        # one-shot reference over the full feed so far
        full = spark.createDataFrame(
            [(g, v) for g, vs in seen.items() for v in vs],
            "k string, v string",
        )
        want = {
            r["k"]: r["est_distinct"]
            for r in SK.kmv_estimate(
                SK.kmv_sketch(full, ["k"], "v", k=K), ["k"], k=K
            ).collect()
        }
        assert got == want, f"after batch {i}"
    # sub-k groups stay exact through the stream
    assert got["b"] == 2.0 and got["c"] == 5.0

    # replay no-op; fresh checkpoint rebuilds to the same state
    q = stream_kmv_maintenance(spark, raw, state, ckpt, kmv_k=K)
    q.awaitTermination(120)
    q = stream_kmv_maintenance(
        spark, raw, state, str(tmp_path / "ck2"), kmv_k=K
    )
    q.awaitTermination(120)
    assert {
        r["k"]: r["est_distinct"]
        for r in read_maintained_kmv_estimate(
            spark, state, kmv_k=K
        ).collect()
    } == want


def test_hist_delta_maintenance_equals_rebuild(spark):
    """hist_merge(base, hist_deltas(changes)) must equal a fresh
    hist_sketch of the post-change rows bin-for-bin — including
    NULL-keyed groups (union+groupBy needs no null-safe join) and
    emptied bins dropping out."""
    rows = [("a", 10.0), ("a", 52.0), ("a", 53.0), (None, 7.0), ("b", 5.0)]
    base_df = spark.createDataFrame(rows, "g string, v double")
    W = 1000  # 10.00 units per bin at scale 100
    base = SK.hist_sketch(base_df, ["g"], "v", W)
    ch = spark.createDataFrame(
        [
            ("a", "D", 10.0, None),        # empties a's low bin
            ("a", "U", 52.0, 12.0),        # moves across bins
            (None, "I", None, 71.0),       # NULL group gains a bin
            ("b", "D", 5.0, None),         # b disappears entirely
        ],
        "g string, op string, old_val double, new_val double",
    )
    maintained = {
        (r["g"], r["bin"]): r["cnt"]
        for r in SK.hist_merge(
            base, SK.hist_deltas(ch, ["g"], W), ["g"]
        ).collect()
    }
    final_rows = [("a", 12.0), ("a", 53.0), (None, 7.0), (None, 71.0)]
    rebuilt = {
        (r["g"], r["bin"]): r["cnt"]
        for r in SK.hist_sketch(
            spark.createDataFrame(final_rows, "g string, v double"),
            ["g"], "v", W,
        ).collect()
    }
    assert maintained == rebuilt

    # quantile readout: deterministic midpoints, error <= W/2/scale
    est = {
        (r["g"], r["q"]): r["est"]
        for r in SK.hist_quantiles(
            SK.hist_sketch(
                spark.createDataFrame(
                    [("g", float(v)) for v in range(1, 101)],
                    "g string, v double",
                ),
                ["g"], "v", W,
            ),
            ["g"], [0.25, 0.5, 0.75], W,
        ).collect()
    }
    for q in (0.25, 0.5, 0.75):
        true_q = q * 100
        assert abs(est[("g", q)] - true_q) <= W / 2 / 100 + 1


def test_streaming_hist_quantile_maintenance(spark, tmp_path):
    """Streamed histogram state (deltas only, deletes included) yields
    the same quantiles as a rebuild of the surviving multiset after
    every batch; replay no-ops; fresh checkpoint rebuilds."""
    import os

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        read_maintained_quantiles,
        stream_hist_maintenance,
    )

    raw = str(tmp_path / "raw")
    state = str(tmp_path / "hist")
    ckpt = str(tmp_path / "ckpt")
    W, QS = 200, [0.5]

    def write(name, rows):
        os.makedirs(raw, exist_ok=True)
        with open(os.path.join(raw, name), "w") as f:
            f.write("k,op,old_val,new_val\n" + "\n".join(rows) + "\n")

    live: dict[str, list[float]] = {}

    def apply(rows):
        for r in rows:
            k, op, old, new = r.split(",")
            if op in ("I", "U"):
                live.setdefault(k, []).append(float(new))
            if op in ("D", "U"):
                live[k].remove(float(old))

    batches = [
        [f"a,I,,{v}.0" for v in range(1, 41)] + ["b,I,,5.0", "b,I,,9.0"],
        [f"a,D,{v}.0," for v in range(1, 21)] + ["b,U,9.0,7.0"],
    ]
    for i, rows in enumerate(batches, start=1):
        write(f"b{i}.csv", rows)
        q = stream_hist_maintenance(
            spark, raw, state, ckpt, bin_width=W
        )
        q.awaitTermination(120)
        apply(rows)
        got = {
            (r["k"], r["q"]): r["est"]
            for r in read_maintained_quantiles(
                spark, state, QS, W
            ).collect()
        }
        want = {
            (r["k"], r["q"]): r["est"]
            for r in SK.hist_quantiles(
                SK.hist_sketch(
                    spark.createDataFrame(
                        [(k, v) for k, vs in live.items() for v in vs],
                        "k string, v double",
                    ),
                    ["k"], "v", W,
                ),
                ["k"], QS, W,
            ).collect()
        }
        assert got == want, f"after batch {i}"

    # fresh checkpoint rebuild converges to the same state
    q = stream_hist_maintenance(
        spark, raw, state, str(tmp_path / "ck2"), bin_width=W
    )
    q.awaitTermination(120)
    assert {
        (r["k"], r["q"]): r["est"]
        for r in read_maintained_quantiles(spark, state, QS, W).collect()
    } == want


def test_sketch_plans_have_no_cartesian_and_bounded_shuffles(spark):
    """Plan pins: the KMV build is distinct + one bounded window (no
    cartesian, no nested loop); histogram maintenance is
    union+groupBy only — no join anywhere, so there is nothing to
    degrade at 100× key cardinality."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        executed_plan_text,
    )

    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 31 % 211).alias("v"),
    )
    plan = executed_plan_text(SK.kmv_sketch(df, ["g"], "v", k=16))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan

    ch = spark.createDataFrame(
        [("a", "I", None, 5.0)],
        "g string, op string, old_val double, new_val double",
    )
    base = SK.hist_sketch(
        df.withColumnRenamed("v", "val").selectExpr(
            "g", "CAST(val AS DOUBLE) AS v"
        ),
        ["g"], "v", 100,
    )
    plan2 = executed_plan_text(
        SK.hist_merge(base, SK.hist_deltas(ch, ["g"], 100), ["g"])
    )
    for node in ("Join", "CartesianProduct", "BroadcastNestedLoop"):
        assert node not in plan2, node


def test_null_values_are_ignored_by_both_sketch_families(spark):
    """COUNT(DISTINCT)/aggregate semantics: NULL values occupy no KMV
    slot (an unfiltered NULL hash would sort first and poison the
    sketch through every future merge) and no histogram bin."""
    df = spark.createDataFrame(
        [("g", str(i)) for i in range(10)] + [("g", None)] * 3,
        "g string, v string",
    )
    sk = SK.kmv_sketch(df, ["g"], "v", k=8).collect()
    assert len(sk) == 8 and all(r["h"] is not None for r in sk)
    # and a merge never resurrects NULL slots
    merged = SK.kmv_merge(
        SK.kmv_sketch(df, ["g"], "v", k=8),
        SK.kmv_sketch(df, ["g"], "v", k=8),
        ["g"], k=8,
    ).collect()
    assert all(r["h"] is not None for r in merged)

    hist_df = spark.createDataFrame(
        [("g", 5.0), ("g", None)], "g string, v double"
    )
    hs = SK.hist_sketch(hist_df, ["g"], "v", 100).collect()
    assert [(r["bin"], r["cnt"]) for r in hs] == [(5, 1)]
    # a D row with a NULL old image deltas nothing (no NULL-bin -1)
    ch = spark.createDataFrame(
        [("g", "D", None, None)],
        "g string, op string, old_val double, new_val double",
    )
    assert SK.hist_deltas(ch, ["g"], 100).count() == 0


def test_compact_zorder_multicolumn_unpartitioned(spark, tmp_path):
    """The multi-column z_value branch of compact(cluster_by=[a, b]):
    rows unchanged and skipping bites on BOTH columns afterwards."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as S,
    )

    rows = spark.range(4000).select(
        (F.col("id") * 37 % 500).alias("x"),
        (F.col("id") * 101 % 500).alias("y"),
        F.col("id").alias("pk"),
    )
    path = str(tmp_path / "t")
    S.commit(spark, rows.repartition(16), path, stats_for=["x", "y"])
    S.compact(spark, path, cluster_by=["x", "y"], n_files=16)
    assert S.read(spark, path).count() == 4000
    for col in ("x", "y"):
        rep: dict = {}
        got = S.read_where(spark, path, [(col, "<", 40)], report=rep)
        assert got.count() == rows.filter(f"{col} < 40").count()
        assert rep["files_kept"] < rep["files_total"], (col, rep)


def test_kmv_intersect_exact_on_small_sets(spark):
    """When the union holds fewer than k distinct values, the sketches
    are complete sets and every estimate collapses to the EXACT
    union/intersection/Jaccard — including a group present in only one
    side and a NULL-keyed group (null-safe joins)."""
    rows_a = (
        [("g", f"v{i}") for i in range(10)]            # g: v0..v9
        + [("solo", "x"), ("solo", "y")]
        + [(None, f"n{i}") for i in range(4)]          # NULL-keyed group
    )
    rows_b = (
        [("g", f"v{i}") for i in range(5, 20)]         # g: v5..v19
        + [(None, f"n{i}") for i in range(2, 6)]
    )
    a = SK.kmv_sketch(
        spark.createDataFrame(rows_a, "k string, v string"), ["k"], "v"
    )
    b = SK.kmv_sketch(
        spark.createDataFrame(rows_b, "k string, v string"), ["k"], "v"
    )
    got = {
        r["k"]: (r["est_union"], r["est_intersect"], r["est_jaccard"])
        for r in SK.kmv_intersect_estimate(a, b, ["k"]).collect()
    }
    # g: |A|=10, |B|=15, |A∩B|=5, |A∪B|=20
    assert got["g"] == (20.0, 5.0, round(5 / 20, 6))
    assert got["solo"] == (2.0, 0.0, 0.0)
    # NULL key: |A|=4 (n0..n3), |B|=4 (n2..n5), ∩=2, ∪=6
    assert got[None] == (6.0, 2.0, round(2 / 6, 6))


def test_kmv_intersect_estimates_track_truth_on_large_sets(spark):
    """Above k the estimates are approximate: with k=64 (SE ≈ 1/√62 on
    the Jaccard ratio) the union/intersection/Jaccard estimates must
    land within loose 3-sigma-ish bands of the truth."""
    n = 3000
    a_vals = [f"u{i}" for i in range(n)]               # u0..u2999
    b_vals = [f"u{i}" for i in range(n // 2, 2 * n)]   # u1500..u5999
    a = SK.kmv_sketch(
        spark.createDataFrame(
            [("g", v) for v in a_vals], "k string, v string"
        ),
        ["k"], "v", k=64,
    )
    b = SK.kmv_sketch(
        spark.createDataFrame(
            [("g", v) for v in b_vals], "k string, v string"
        ),
        ["k"], "v", k=64,
    )
    r = SK.kmv_intersect_estimate(a, b, ["k"], k=64).collect()[0]
    true_union, true_inter = 2 * n, n // 2  # 6000, 1500
    true_j = true_inter / true_union  # 0.25
    assert abs(r["est_union"] - true_union) / true_union < 0.5
    assert abs(r["est_jaccard"] - true_j) < 0.2
    assert abs(r["est_intersect"] - true_inter) / true_inter < 0.8


def test_cm_exact_when_wide_and_overestimates_when_narrow(spark):
    """Count-Min point queries: with width large enough that no two
    items collide the estimate IS the true count; with a narrow width
    estimates never UNDERestimate (counters only add collisions)."""
    df = spark.range(3000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") % 37).alias("v"),
    )
    truth = {
        (r["g"], r["v"]): r["c"]
        for r in df.groupBy("g", "v").agg(F.count("*").alias("c")).collect()
    }
    items = df.select("g", "v").distinct()
    wide = SK.cm_estimate(
        SK.cm_sketch(df, ["g"], "v", depth=4, width=8192),
        items, ["g"], "v", depth=4, width=8192,
    )
    for r in wide.collect():
        assert r["est_cnt"] == truth[(r["g"], r["v"])]
    narrow = SK.cm_estimate(
        SK.cm_sketch(df, ["g"], "v", depth=3, width=8),
        items, ["g"], "v", depth=3, width=8,
    )
    for r in narrow.collect():
        assert r["est_cnt"] >= truth[(r["g"], r["v"])]


def test_cm_delta_maintenance_equals_rebuild(spark):
    """The turnstile property: base sketch + CDC counter deltas lands
    on EXACTLY the counters of a from-scratch sketch of the post-change
    state — including deletes that empty a counter (dropped, not kept
    at zero)."""
    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 23).alias("v"),
    )
    ch = spark.createDataFrame(
        [
            ("0", "I", None, 99),     # new item
            ("1", "D", 5, None),      # remove one occurrence
            ("2", "U", 7, 8),         # shift an occurrence
            ("0", "D", 0, None),
            ("0", "I", None, 0),      # delete + reinsert cancels
        ],
        "g string, op string, old_val long, new_val long",
    )
    D, W = 4, 64
    maintained = SK.cm_merge(
        SK.cm_sketch(df, ["g"], "v", depth=D, width=W),
        SK.cm_deltas(ch, ["g"], depth=D, width=W),
        ["g"],
    )
    post = (
        df.join(
            spark.createDataFrame(
                [("1", 5), ("2", 7), ("0", 0)], "g string, v long"
            )
            .groupBy("g", "v")
            .agg(F.count("*").alias("_rm")),
            ["g", "v"],
            "left",
        )
        # remove exactly one occurrence per D/U old image
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("g", "v").orderBy(F.lit(1))
            ),
        )
        .filter((F.col("_rm").isNull()) | (F.col("rn") > F.col("_rm")))
        .select("g", "v")
        .unionByName(
            spark.createDataFrame(
                [("0", 99), ("2", 8), ("0", 0)], "g string, v long"
            )
        )
    )
    rebuilt = SK.cm_sketch(post, ["g"], "v", depth=D, width=W)
    got = {
        (r["g"], r["row"], r["bucket"]): r["cnt"]
        for r in maintained.collect()
    }
    want = {
        (r["g"], r["row"], r["bucket"]): r["cnt"] for r in rebuilt.collect()
    }
    assert got == want


def test_cm_merge_of_sketches_equals_sketch_of_union(spark):
    """Counter-wise addition is the exact merge algebra: per-shard
    sketches compose into the global sketch with no error growth."""
    df = spark.range(4000).select(
        F.lit("g").alias("g"), (F.col("id") % 101).alias("v")
    )
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)
    D, W = 4, 32
    merged = {
        (r["g"], r["row"], r["bucket"]): r["cnt"]
        for r in SK.cm_merge(
            SK.cm_sketch(a, ["g"], "v", depth=D, width=W),
            SK.cm_sketch(b, ["g"], "v", depth=D, width=W),
            ["g"],
        ).collect()
    }
    whole = {
        (r["g"], r["row"], r["bucket"]): r["cnt"]
        for r in SK.cm_sketch(df, ["g"], "v", depth=D, width=W).collect()
    }
    assert merged == whole


def test_cm_estimate_plan_is_equi_join_only(spark):
    """Plan pin: the sketch probe is an equi-join on (keys, row,
    bucket) — no cartesian, no nested loop — so probe cost scales with
    |candidates|·depth regardless of sketched-corpus size."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        executed_plan_text,
    )

    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("g"),
        (F.col("id") % 17).alias("v"),
    )
    sk = SK.cm_sketch(df, ["g"], "v", depth=4, width=64)
    est = SK.cm_estimate(
        sk, df.select("g", "v").distinct(), ["g"], "v", depth=4, width=64
    )
    plan = executed_plan_text(est)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_cm_maintenance_exactly_once(spark, tmp_path):
    """Streamed Count-Min state (counter deltas only, deletes included)
    yields the same point estimates as a rebuild of the surviving
    multiset after every batch; replay no-ops; fresh checkpoint
    rebuilds."""
    import os

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        read_maintained_cm_estimate,
        stream_cm_maintenance,
    )

    raw = str(tmp_path / "raw")
    state = str(tmp_path / "cm")
    ckpt = str(tmp_path / "ckpt")
    D, W = 3, 32

    def write(name, rows):
        os.makedirs(raw, exist_ok=True)
        with open(os.path.join(raw, name), "w") as f:
            f.write("k,op,old_val,new_val\n" + "\n".join(rows) + "\n")

    live: dict[str, list[float]] = {}

    def apply(rows):
        for r in rows:
            k, op, old, new = r.split(",")
            if op in ("I", "U"):
                live.setdefault(k, []).append(float(new))
            if op in ("D", "U"):
                live[k].remove(float(old))

    batches = [
        [f"a,I,,{v % 7}.0" for v in range(1, 41)] + ["b,I,,5.0", "b,I,,5.0"],
        [f"a,D,{v % 7}.0," for v in range(1, 21)] + ["b,U,5.0,7.0"],
        ["c,I,,1.0", "b,D,5.0,"],
    ]
    items = None
    for i, rows in enumerate(batches, start=1):
        write(f"b{i}.csv", rows)
        q = stream_cm_maintenance(
            spark, raw, state, ckpt, depth=D, width=W, compact_every=2
        )
        q.awaitTermination(120)
        apply(rows)
        full = spark.createDataFrame(
            [(k, v) for k, vs in live.items() for v in vs],
            "k string, v double",
        )
        items = full.select("k", "v").distinct()
        got = {
            (r["k"], r["v"]): r["est_cnt"]
            for r in read_maintained_cm_estimate(
                spark, state, items, "v", depth=D, width=W
            ).collect()
        }
        want = {
            (r["k"], r["v"]): r["est_cnt"]
            for r in SK.cm_estimate(
                SK.cm_sketch(full, ["k"], "v", depth=D, width=W),
                items, ["k"], "v", depth=D, width=W,
            ).collect()
        }
        assert got == want, f"after batch {i}"
        # estimates never underestimate the true surviving counts
        truth = {
            (r["k"], r["v"]): r["c"]
            for r in full.groupBy("k", "v")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        for key, est in got.items():
            assert est >= truth[key]

    # replay no-op; fresh checkpoint rebuild converges to same state
    q = stream_cm_maintenance(spark, raw, state, ckpt, depth=D, width=W)
    q.awaitTermination(120)
    q = stream_cm_maintenance(
        spark, raw, state, str(tmp_path / "ck2"), depth=D, width=W
    )
    q.awaitTermination(120)
    assert {
        (r["k"], r["v"]): r["est_cnt"]
        for r in read_maintained_cm_estimate(
            spark, state, items, "v", depth=D, width=W
        ).collect()
    } == want


def test_hll_merge_equals_full_build_and_is_idempotent(spark):
    """Register-wise max is the whole merge algebra: merging two half
    sketches equals the one-shot sketch of everything, and re-merging a
    batch is a no-op (at-least-once delivery safety)."""
    df = spark.range(4000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("v"),
    )
    full = SK.hll_sketch(df, ["g"], "v", p=6)
    halves = SK.hll_merge(
        SK.hll_sketch(df.filter(F.col("id") % 2 == 0), ["g"], "v", p=6),
        SK.hll_sketch(df.filter(F.col("id") % 2 == 1), ["g"], "v", p=6),
        ["g"],
    )
    assert sorted(map(tuple, full.collect())) == sorted(
        map(tuple, halves.collect())
    )
    again = SK.hll_merge(halves, full, ["g"])
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_estimate_tracks_truth_in_valid_regime(spark):
    """Raw estimator (no linear-counting correction): accuracy holds
    for n ≳ 2.5·m. With p=6 (m=64, SE ≈ 1.04/8 = 13%), a
    2000-distinct group must land within ~3 SE."""
    df = spark.range(2000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    [row] = SK.hll_estimate(
        SK.hll_sketch(df, ["g"], "v", p=6), ["g"], p=6
    ).collect()
    assert row["present_regs"] <= 64
    assert abs(row["est_distinct"] - 2000) / 2000 < 0.4


def test_hll_nulls_ignored_and_state_bounded(spark):
    """NULL values never occupy a register (COUNT DISTINCT
    semantics), and state is hard-capped at 2^p rows per group no
    matter the cardinality."""
    df = spark.range(50000).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    sk = SK.hll_sketch(df, ["g"], "v", p=6)
    assert sk.count() <= 64
    only_null = spark.createDataFrame(
        [("g", None)], "g string, v long"
    )
    assert SK.hll_sketch(only_null, ["g"], "v", p=6).count() == 0


def test_hll_sketch_plan_is_single_aggregate_no_window(spark):
    """The 100 TB plan shape: ONE map-side-combined aggregate — no
    distinct pre-pass, no window, no join. (KMV needs the distinct +
    top-k window; HLL's idempotent max() needs neither.)"""
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 100).alias("v"),
    )
    plan = (
        SK.hll_sketch(df, ["g"], "v", p=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_streaming_hll_maintenance_exactly_once(spark, tmp_path):
    """Streamed HLL register state equals the one-shot sketch of the
    full feed after every batch; replay no-ops; a fresh checkpoint
    rebuilds to the same registers (idempotent merge algebra)."""
    import os

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        read_maintained_hll_estimate,
        stream_hll_maintenance,
    )

    raw = str(tmp_path / "raw")
    state = str(tmp_path / "hll")
    ckpt = str(tmp_path / "ckpt")

    def write(name, pairs):
        os.makedirs(raw, exist_ok=True)
        with open(os.path.join(raw, name), "w") as f:
            f.write("k,v\n")
            for g, v in pairs:
                f.write(f"{g},{v}\n")

    seen: dict[str, set] = {}
    batches = [
        [("a", f"u{i}") for i in range(200)] + [("b", "x"), ("b", "y")],
        [("a", f"u{i}") for i in range(150, 400)] + [("b", "x")],
        [("c", f"w{i}") for i in range(40)],
    ]
    for i, rows in enumerate(batches, start=1):
        write(f"b{i}.csv", rows)
        q = stream_hll_maintenance(spark, raw, state, ckpt, p=6)
        q.awaitTermination(120)
        for g, v in rows:
            seen.setdefault(g, set()).add(v)
        got = {
            r["k"]: (r["present_regs"], r["est_distinct"])
            for r in read_maintained_hll_estimate(
                spark, state, p=6
            ).collect()
        }
        full = spark.createDataFrame(
            [(g, v) for g, vs in seen.items() for v in vs],
            "k string, v string",
        )
        want = {
            r["k"]: (r["present_regs"], r["est_distinct"])
            for r in SK.hll_estimate(
                SK.hll_sketch(full, ["k"], "v", p=6), ["k"], p=6
            ).collect()
        }
        assert got == want, f"after batch {i}"

    # replay no-op; fresh checkpoint rebuilds to the same state
    q = stream_hll_maintenance(spark, raw, state, ckpt, p=6)
    q.awaitTermination(120)
    q = stream_hll_maintenance(
        spark, raw, state, str(tmp_path / "ck2"), p=6
    )
    q.awaitTermination(120)
    rebuilt = {
        r["k"]: (r["present_regs"], r["est_distinct"])
        for r in read_maintained_hll_estimate(spark, state, p=6).collect()
    }
    assert rebuilt == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
    st.lists(st.integers(0, 500), min_size=0, max_size=60),
)
def test_hll_merge_property_random_multisets(spark, xs, ys):
    """Property: merge(sketch(A), sketch(B)) == sketch(A ∪ B)
    register-for-register, for arbitrary overlapping multisets —
    the exactness that makes HLL state maintainable without rescans."""

    def frame(vals):
        if not vals:
            return spark.createDataFrame([], "g string, v long")
        return spark.createDataFrame(
            [("g", v) for v in vals], "g string, v long"
        )

    merged = SK.hll_merge(
        SK.hll_sketch(frame(xs), ["g"], "v", p=4),
        SK.hll_sketch(frame(ys), ["g"], "v", p=4),
        ["g"],
    )
    full = SK.hll_sketch(frame(xs + ys), ["g"], "v", p=4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
