from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import (
    catalog,
    explain,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns


def test_contract_shapes(spark):
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40
    # rows-only entries are exactly the non-SQL-reproducible ops
    assert set(q) - set(o) == {
        "multimodal_meta",
        "frame_sample_plan",
        "approx_distinct_users",
        "ivf_ann_topk",
        "cosine_topk_fast",
        "minhash_fast",
        "simhash_signatures",
    }


def test_scan_pushdown(spark, sf_dir):
    df = catalog.q_scan_filter_project(spark, sf_dir)
    # both predicates must reach the parquet scan
    explain.assert_pushed_filter(df, "l_quantity")
    explain.assert_pushed_filter(df, "l_discount")
    # projection pruning: scan must not read all 11 lineitem columns
    info = explain.scan_pushdown_info(df)
    assert "l_returnflag" not in info


def test_fk_semi_is_broadcast_not_shuffle(spark, sf_dir):
    df = catalog.q_fk_semi_join(spark, sf_dir)
    explain.assert_broadcast_join(df)


def test_pricing_summary_whole_stage_codegen(spark, sf_dir):
    df = catalog.q_pricing_summary(spark, sf_dir)
    assert explain.codegen_stage_count(df) >= 1
    explain.assert_no_python_row_udf(df)


def test_merge_sim_no_python_udf(spark, sf_dir):
    explain.assert_no_python_row_udf(catalog.q_merge_upsert_sim(spark, sf_dir))
