"""End-to-end run over the reference's shipped Data/ tree (SURVEY.md §5.3b):
the known-good invariants are 1,000 / 7,500 / 40,803 clean rows in → same
counts out, zero rejects, zero FK orphans (the shipped data is fully clean,
SURVEY.md §1.5). Read-only input; all writes go to tmp."""

from __future__ import annotations

import glob
import os

import pytest

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.jobs import (
    run_etl_job,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    ORDER_ITEMS,
    ORDERS,
    PRODUCTS,
)

REF_DATA = "/root/reference/Data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference data not present"
)


@pytest.fixture(scope="module")
def ref_run(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("ref_parity"))
    wh, rej = f"{base}/wh", f"{base}/rej"
    results = {}
    results["products"] = run_etl_job(
        spark, PRODUCTS, f"{REF_DATA}/products.csv", wh, rej, "ref"
    )
    results["orders"] = run_etl_job(
        spark,
        ORDERS,
        sorted(glob.glob(f"{REF_DATA}/orders_apr_2025/*.csv")),
        wh,
        rej,
        "ref",
    )
    refs = {
        "orders": spark.read.parquet(f"{wh}/orders"),
        "products": spark.read.parquet(f"{wh}/products"),
    }
    results["order_items"] = run_etl_job(
        spark,
        ORDER_ITEMS,
        sorted(glob.glob(f"{REF_DATA}/order_items_apr_2025/*.csv")),
        wh,
        rej,
        "ref",
        ref_tables=refs,
    )
    return wh, results


def test_clean_counts(ref_run):
    _, results = ref_run
    expected = {"products": 1000, "orders": 7500, "order_items": 40803}
    for table, n in expected.items():
        r = results[table]
        assert r.rows_in == n, table
        assert r.rows_written == n, (table, r)
        assert r.rows_rejected == 0, table


def test_partitioned_by_fifteen_days(ref_run, spark):
    wh, _ = ref_run
    days = {
        os.path.basename(p)
        for p in glob.glob(f"{wh}/orders/date=*")
    }
    assert len(days) == 15
    df = spark.read.parquet(f"{wh}/orders")
    one_day = df.filter(df.date == "2025-04-01")
    assert one_day.count() == 500  # 500 orders per daily file


def test_fk_integrity_of_shipped_data(ref_run, spark):
    wh, _ = ref_run
    items = spark.read.parquet(f"{wh}/order_items")
    orders = spark.read.parquet(f"{wh}/orders")
    orphans = items.join(orders, "order_id", "left_anti")
    assert orphans.count() == 0
