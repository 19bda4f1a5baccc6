from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.jobs import (
    run_etl_job,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.replay import (
    read_rejects,
    replay_rejects,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import ORDERS
from tests.conftest import ORDERS_HEADER


def test_quarantine_replay_recovers_fixed_rows(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "orders.csv").write_text(
        ORDERS_HEADER + "\n"
        "1,101,1001,2025-04-01T10:00:00,10.00,2025-04-01\n"
        "2,102,1002,2025-04-01T11:00:00,,2025-04-01\n"  # null amount → reject
        "3,103,1003,2025-04-01T12:00:00,,2025-04-01\n"  # null amount → reject
    )
    wh, rej = str(tmp_path / "wh"), str(tmp_path / "rej")
    res = run_etl_job(spark, ORDERS, f"{raw_dir}/*.csv", wh, rej, "r1")
    assert res.rows_written == 1 and res.rows_rejected == 2

    quarantined = read_rejects(spark, rej, "orders", "r1")
    assert quarantined.count() == 2

    # upstream fix arrives: defaulting missing amounts to 0.0
    n_ok, n_bad = replay_rejects(
        spark,
        ORDERS,
        rej,
        wh,
        source_run_id="r1",
        replay_run_id="r1-replay",
        fixer=lambda df: df.withColumn(
            "total_amount", F.coalesce(F.col("total_amount"), F.lit("0.0"))
        ),
    )
    assert (n_ok, n_bad) == (2, 0)
    table = spark.read.parquet(f"{wh}/orders")
    assert table.count() == 3
    got = {r["order_id"]: r["total_amount"] for r in table.collect()}
    assert got == {101: 10.0, 102: 0.0, 103: 0.0}


def test_replay_requarantines_unfixable_rows(spark, tmp_path):
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    (raw_dir / "orders.csv").write_text(
        ORDERS_HEADER + "\n"
        "1,101,1001,2025-04-01T10:00:00,10.00,2025-04-01\n"
        ",,1002,2025-04-01T11:00:00,,2025-04-01\n"  # hopeless row
    )
    wh, rej = str(tmp_path / "wh"), str(tmp_path / "rej")
    run_etl_job(spark, ORDERS, f"{raw_dir}/*.csv", wh, rej, "r1")
    n_ok, n_bad = replay_rejects(
        spark, ORDERS, rej, wh, "r1", "r2", fixer=None
    )
    assert (n_ok, n_bad) == (0, 1)
    assert read_rejects(spark, rej, "orders", "r2").count() == 1
