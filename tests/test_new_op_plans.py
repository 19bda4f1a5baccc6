"""Plan-shape pins for the round-2 operators: the physical plan each one
was designed around, asserted so regressions surface as test failures
rather than silent slowdowns at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    frequency as FQ,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.anomaly import (
    rolling_zscore_flags,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sampling import (
    weighted_sample,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
    executed_plan_text,
)


def test_weighted_sample_is_take_ordered(spark):
    """Top-k must compile to TakeOrderedAndProject (per-task partial
    top-k, k rows to the driver merge) — never a full global Sort."""
    df = spark.createDataFrame(
        [(i, (i % 5) + 1) for i in range(100)], "id long, w long"
    )
    plan = executed_plan_text(weighted_sample(df, "id", "w", 5))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_heavy_hitters_exact_pass_broadcasts_candidates(spark):
    """The exact counting pass must semi-join the (bounded) candidate
    set via broadcast — a shuffled join would defeat the design."""
    df = spark.createDataFrame([("a",)] * 50 + [("b",)] * 3, "term string")
    plan = executed_plan_text(FQ.heavy_hitters(df, "term", 4))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_anomaly_single_window_single_exchange(spark):
    """All three running sums share one window spec → exactly one Window
    node and one hash Exchange on the partition key."""
    df = spark.createDataFrame(
        [(i, i % 3, float(i), float(i * 7 % 13)) for i in range(60)],
        "event_id long, user_id long, t double, value double",
    )
    plan = executed_plan_text(
        rolling_zscore_flags(df, "user_id", ["t", "event_id"], "value")
    ).split("== Initial Plan ==")[0]
    assert plan.count("Window") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_star_cc_logarithmic_rounds(spark):
    """The large-star/small-star loop must converge in O(log d) rounds —
    a 512-node path graph (diameter 511, min-label propagation's worst
    case needing ~511 rounds) must finish in ~log2(512)+slack."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.graph import (
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(511)], "doc1 long, doc2 long"
    )
    stats: dict = {}
    cc = connected_components_star(edges, "doc1", "doc2", stats=stats)
    got = {r["node"]: r["component"] for r in cc.collect()}
    assert len(got) == 512 and all(c == 0 for c in got.values())
    assert stats["rounds"] <= 14, stats  # log2(511) ≈ 9, generous slack


def test_gopher_flags_single_scan_no_shuffle(spark, sf_dir):
    """Every Gopher rule is a per-row projection: the plan must contain
    exactly one parquet scan and ZERO exchanges, and the scan must prune
    to the two referenced columns."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        q_gopher_quality_flags,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        plan_text,
    )

    plan = plan_text(q_gopher_quality_flags(spark, sf_dir))
    assert "Exchange" not in plan
    tree = plan.split("\n\n")[0]  # formatted mode repeats nodes in detail
    assert tree.count("Scan parquet") == 1
    assert "doc_id" in plan and "text" in plan
    assert "n_chars:" not in plan  # untouched columns pruned from the scan


def test_tfidf_scan_prunes_and_stays_jvm(spark, sf_dir):
    """TF-IDF reads only (doc_id, text) from parquet and runs fully
    JVM-side — no Python row UDF anywhere in the plan."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        q_tfidf_topk_terms,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        assert_no_python_row_udf,
        plan_text,
    )

    df = q_tfidf_topk_terms(spark, sf_dir)
    assert_no_python_row_udf(df)
    plan = plan_text(df)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_normalize_dedup_single_aggregation_exchange(spark, sf_dir):
    """Normalization dedup is scan → project → ONE hash aggregation on
    the fingerprint: exactly one exchange pair (partial/final agg), no
    join, no sort."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        q_text_normalize_dedup,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        plan_text,
    )

    plan = plan_text(q_text_normalize_dedup(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1 and "hashpartitioning" in plan
    assert "Join" not in plan and "Sort" not in plan
