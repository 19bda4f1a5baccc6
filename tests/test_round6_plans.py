"""Plan-shape pins for the round-6 operators: the FastSS ER candidate
join must be an EQUI-join on (block, signature) with no cartesian
anywhere, the decontamination sweep must broadcast the benchmark side,
and the video/media path must stay free of row-at-a-time Python."""

from __future__ import annotations

from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
    catalog,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
    assert_no_python_row_udf,
    plan_text,
)

SF = "/root/testdata/sf0.001"


def test_er_candidates_join_is_equi_not_cartesian(spark):
    df = catalog.CATALOG["er_golden_records"].builder(spark, SF)
    # the final plan (post union-find) must not hide a cartesian…
    assert "CartesianProduct" not in plan_text(df)
    # …and the candidate-generation stage itself must hash/sort-join
    # on the signature, never nested-loop over block pairs
    import pyspark.sql.functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        load_table,
    )

    c = load_table(spark, SF, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    n = F.col("c_name")
    sigs = F.array_union(
        F.array(n),
        F.transform(
            F.sequence(F.lit(1), F.length(n)),
            lambda i: F.concat(
                n.substr(F.lit(1), i - 1), n.substr(i + 1, F.length(n))
            ),
        ),
    )
    sig = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.col("c_nationkey").alias("blk"),
        F.explode(sigs).alias("sig"),
    )
    a = sig.select(F.col("k").alias("k1"), F.col("nm").alias("n1"), "blk", "sig")
    b = sig.select(F.col("k").alias("k2"), F.col("nm").alias("n2"), "blk", "sig")
    pairs = (
        a.join(b, ["blk", "sig"])
        .filter(F.col("k1") < F.col("k2"))
        .filter(F.levenshtein(F.col("n1"), F.col("n2"), 1) >= 0)
        .select("k1", "k2")
        .distinct()
    )
    p = plan_text(pairs)
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "sig" in p  # the join keys include the signature


def test_decontaminate_has_no_cartesian_or_python_row_udf(spark):
    df = catalog.CATALOG["decontaminate_train_bench"].builder(spark, SF)
    p = plan_text(df)
    assert "CartesianProduct" not in p
    assert_no_python_row_udf(df)


def test_video_frame_stats_is_arrow_batched_only(spark):
    df = catalog.CATALOG["video_frame_stats"].builder(spark, SF)
    # mapInPandas shows as MapInPandas / ArrowEvalPython-free plan
    assert_no_python_row_udf(df)
    assert "MapInPandas" in plan_text(df)
