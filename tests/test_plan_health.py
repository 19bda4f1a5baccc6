"""Catalog-wide plan-health sweep (round-9 verdict task 4).

Every query in the catalog gets its PRE-execution physical plan checked for
the two hard-line scale killers — CartesianProduct and row-at-a-time
BatchEvalPython — so a future query cannot land with one unnoticed. The
checker itself is validated against deliberately bad plans (a hint-forced
cartesian and a row UDF), and the pushdown pin is asserted on the legs that
pin it today.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
    catalog,
    explain,
)


def test_catalog_sweep_no_cartesian_no_row_python(spark, sf_dir):
    """Sweep EVERY catalog builder at sf0.001: building the DataFrame is
    enough (plan inspection never executes the query), so this also covers
    queries added in future rounds automatically.

    r15: the sweep runs on a small thread pool — ~200 builders at
    0.3-1 s of driver-side planning each (a few imperative sim builders
    also execute their setup commits) made this the suite's
    second-slowest test (128 s); jobs submitted from driver threads are
    a documented Spark pattern (guide §2.6) and each sim builder writes
    its own per-name temp dir, so builders don't collide."""
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, qd = item
        df = qd.builder(spark, sf_dir)
        return name, explain.scale_killer_flags(df)

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(check, catalog.CATALOG.items()))
    bad = {name: flags for name, flags in results if flags}
    assert not bad, f"scale-killer plans: {bad}"


def test_sweep_detects_injected_cartesian(spark):
    a = spark.range(100)
    b = spark.range(100).withColumnRenamed("id", "jd")
    forced = a.hint("shuffle_replicate_nl").crossJoin(b)
    assert "cartesian-product" in explain.scale_killer_flags(forced)


def test_sweep_detects_injected_row_udf(spark):
    inc = F.udf(lambda x: x + 1, "long")
    bad = spark.range(10).select(inc("id").alias("x"))
    assert "row-python-udf" in explain.scale_killer_flags(bad)
    # and the sanctioned Arrow path is NOT flagged
    ok = spark.range(10).mapInPandas(lambda it: it, "id long")
    assert explain.scale_killer_flags(ok) == []


def test_tiny_dimension_joins_broadcast(spark, sf_dir):
    """Legs that join the known-tiny dimensions (nation: 25 rows, region: 5
    rows) must broadcast them — a SortMergeJoin against a 5-row table is a
    needless shuffle of the fact side at any scale.  nation/region parquet
    is far under spark.sql.autoBroadcastJoinThreshold, so the static plan
    should already pick BroadcastHashJoin; this pins that it keeps doing so
    (round-10 verdict task 8)."""
    for name in (
        "local_supplier_volume",
        "nation_trade_volume",
        "product_profit_by_nation",
        "min_cost_supplier",
        "excess_stock_suppliers",
        "nation_market_share",
    ):
        df = catalog.CATALOG[name].builder(spark, sf_dir)
        text = explain.plan_text(df)
        assert "BroadcastHashJoin" in text, (
            f"{name}: no BroadcastHashJoin in plan — tiny dimension "
            f"(nation/region) not broadcast:\n{text[:2000]}"
        )


def test_pushdown_pins_still_hold(spark, sf_dir):
    """The legs that pin predicate pushdown today: their filters must keep
    reaching the parquet scan (non-empty PushedFilters in the plan)."""
    for name in (
        "scan_filter_project",
        "partition_pruned_day",
        "shipping_priority",
        "local_supplier_volume",
    ):
        df = catalog.CATALOG[name].builder(spark, sf_dir)
        assert explain.has_nonempty_pushed_filters(df), (
            f"{name}: no non-empty PushedFilters in scan"
        )
