"""SCD2 history merge and Z-order layout tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import scd
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import layout
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    load_table,
)

TS = dt.datetime


def _snapshot(spark):
    return spark.createDataFrame(
        [
            (1, "books", 9.99, TS(2025, 1, 1)),
            (2, "games", 19.99, TS(2025, 1, 1)),
        ],
        "product_id int, category string, price double, updated_at timestamp",
    )


def test_scd2_versions_changes_and_inserts(spark):
    hist = scd.scd2_init(_snapshot(spark), "updated_at")
    updates = spark.createDataFrame(
        [
            (1, "books", 12.99, TS(2025, 2, 1)),   # price change → new version
            (2, "games", 19.99, TS(2025, 2, 1)),   # no change → no new version
            (3, "toys", 5.00, TS(2025, 2, 1)),     # brand-new key
        ],
        "product_id int, category string, price double, updated_at timestamp",
    )
    out = scd.scd2_apply(hist, updates, "product_id", ["category", "price"],
                         "updated_at")
    rows = {(r.product_id, r.is_current): r for r in out.collect()}
    assert len(rows) == 4  # closed v1 of 1, open v2 of 1, open 2, open 3
    closed = rows[(1, False)]
    assert closed.price == 9.99
    assert closed.effective_to == TS(2025, 2, 1)
    assert rows[(1, True)].price == 12.99
    assert rows[(2, True)].effective_to is None
    assert rows[(3, True)].effective_from == TS(2025, 2, 1)


def test_scd2_idempotent_replay(spark):
    hist = scd.scd2_init(_snapshot(spark), "updated_at")
    updates = spark.createDataFrame(
        [(1, "books", 12.99, TS(2025, 2, 1))],
        "product_id int, category string, price double, updated_at timestamp",
    )
    once = scd.scd2_apply(hist, updates, "product_id", ["category", "price"],
                          "updated_at")
    twice = scd.scd2_apply(once, updates, "product_id", ["category", "price"],
                           "updated_at")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


def test_scd2_null_transitions_version(spark):
    hist = scd.scd2_init(
        spark.createDataFrame(
            [(1, None, 9.99, TS(2025, 1, 1))],
            "product_id int, category string, price double, "
            "updated_at timestamp",
        ),
        "updated_at",
    )
    updates = spark.createDataFrame(
        [(1, "books", 9.99, TS(2025, 2, 1))],  # NULL → value must version
        "product_id int, category string, price double, updated_at timestamp",
    )
    out = scd.scd2_apply(hist, updates, "product_id", ["category", "price"],
                         "updated_at")
    assert out.count() == 2
    assert out.filter(F.col("is_current")).first().category == "books"


def test_scd2_as_of(spark):
    hist = scd.scd2_init(_snapshot(spark), "updated_at")
    updates = spark.createDataFrame(
        [(1, "books", 12.99, TS(2025, 2, 1))],
        "product_id int, category string, price double, updated_at timestamp",
    )
    hist2 = scd.scd2_apply(hist, updates, "product_id", ["category", "price"],
                           "updated_at")
    jan = scd.as_of(hist2, TS(2025, 1, 15))
    feb = scd.as_of(hist2, TS(2025, 2, 15))
    assert jan.filter(F.col("product_id") == 1).first().price == 9.99
    assert feb.filter(F.col("product_id") == 1).first().price == 12.99


def test_scd2_rejects_duplicate_batch_keys(spark):
    hist = scd.scd2_init(_snapshot(spark), "updated_at")
    dup = spark.createDataFrame(
        [
            (1, "a", 1.0, TS(2025, 2, 1)),
            (1, "b", 2.0, TS(2025, 2, 2)),
        ],
        "product_id int, category string, price double, updated_at timestamp",
    )
    import pytest

    with pytest.raises(ValueError, match="duplicate"):
        scd.scd2_apply(hist, dup, "product_id", ["category"], "updated_at")
    # probe is optional: with the flag off the duplicate batch is not probed
    # (result would be undefined, but construction must not raise)
    scd.scd2_apply(hist, dup, "product_id", ["category"], "updated_at",
                   check_updates_unique=False)


def test_scd2_stale_update_is_rejected_per_row(spark):
    """An update timestamped BEFORE the open version's effective_from must
    neither close the open version (inverted interval) nor open a new one."""
    hist = scd.scd2_init(_snapshot(spark), "updated_at")
    stale = spark.createDataFrame(
        [
            (1, "books", 4.99, TS(2024, 12, 1)),  # older than 2025-01-01
            (2, "games", 29.99, TS(2025, 2, 1)),  # genuine change
        ],
        "product_id int, category string, price double, updated_at timestamp",
    )
    out = scd.scd2_apply(hist, stale, "product_id", ["category", "price"],
                         "updated_at")
    rows = {(r.product_id, r.is_current): r for r in out.collect()}
    # key 1: untouched open version, no closed row, no inverted interval
    assert (1, False) not in rows
    assert rows[(1, True)].price == 9.99
    assert rows[(1, True)].effective_to is None
    # key 2: normal versioning still applies
    assert rows[(2, False)].effective_to == TS(2025, 2, 1)
    assert rows[(2, True)].price == 29.99
    for r in out.collect():
        if r.effective_to is not None:
            assert r.effective_to >= r.effective_from


def test_zorder_files_skip_on_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered files must each cover a narrow min/max window on BOTH
    cluster columns, so a point predicate on either column lets a
    footer-pruning reader skip most files; a single-column sort gives
    skipping only on its leading column."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "zorder")
    layout.zorder_write(o, zpath, ["o_custkey", "o_totalprice"], n_files=16)

    spans = layout.file_column_spans(zpath, ["o_custkey", "o_totalprice"])
    assert len(spans) >= 8  # repartitionByRange honored the file budget

    # median-ish probe values hit the worst case for skipping
    probe_cust = float(o.approxQuantile("o_custkey", [0.5], 0.01)[0])
    probe_price = float(o.approxQuantile("o_totalprice", [0.5], 0.01)[0])
    skip_cust = layout.skip_fraction(spans, "o_custkey", probe_cust)
    skip_price = layout.skip_fraction(spans, "o_totalprice", probe_price)
    # both dimensions skip simultaneously — the Z-order property
    assert skip_cust >= 0.4, spans
    assert skip_price >= 0.4, spans

    # contrast: lexicographic sort on custkey alone skips nothing on price
    lpath = str(tmp_path / "lexsort")
    (
        o.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lspans = layout.file_column_spans(lpath, ["o_custkey", "o_totalprice"])
    assert layout.skip_fraction(lspans, "o_custkey", probe_cust) >= 0.8
    assert layout.skip_fraction(lspans, "o_totalprice", probe_price) <= 0.2


def test_zorder_preserves_rows(spark, sf_dir, tmp_path):
    o = load_table(spark, sf_dir, "orders")
    zpath = str(tmp_path / "z2")
    layout.zorder_write(o, zpath, ["o_custkey", "o_totalprice"], n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == o.count()
    assert set(back.columns) == set(o.columns)
    assert back.agg(F.sum("o_orderkey")).first()[0] == \
        o.agg(F.sum("o_orderkey")).first()[0]
