"""Manifest-level data skipping: per-file min/max stats recorded at
commit, consulted by read_where at planning time (zero file I/O for
pruned files) — the Delta/Iceberg data-skipping layer over snapshot
tables, composed with Z-order clustering so stats bite on every
cluster column."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_stats_recorded_and_skip_most_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    S.commit(
        spark,
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_for=["o_orderkey", "o_totalprice"],
    )
    snap = S.load_snapshot(path)
    assert snap.file_stats and len(snap.file_stats) >= 8
    lo_key = o.agg(F.min("o_orderkey")).first()[0]
    rep: dict = {}
    got = S.read_where(
        spark, path, [("o_orderkey", "==", lo_key)], report=rep
    )
    assert got.count() == 1
    # range-sorted on o_orderkey → a point predicate hits exactly 1 file
    assert rep["files_kept"] == 1 and rep["files_total"] >= 8


def test_read_where_equals_full_filter(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    S.commit(
        spark,
        o.repartitionByRange(6, "o_totalprice"),
        path,
        stats_for=["o_totalprice"],
    )
    preds = [("o_totalprice", ">=", 100.0), ("o_totalprice", "<", 5000.0)]
    got = sorted(
        r["o_orderkey"]
        for r in S.read_where(spark, path, preds).collect()
    )
    want = sorted(
        r["o_orderkey"]
        for r in S.read(spark, path)
        .filter(
            (F.col("o_totalprice") >= 100.0)
            & (F.col("o_totalprice") < 5000.0)
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_unprunable_without_stats_still_correct(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    S.commit(spark, o.repartition(4), path)  # no stats_for
    rep: dict = {}
    got = S.read_where(
        spark, path, [("o_orderkey", "<", 100)], report=rep
    )
    assert rep["files_kept"] == rep["files_total"]  # nothing prunable
    assert (
        got.count()
        == S.read(spark, path).filter(F.col("o_orderkey") < 100).count()
    )


def test_date_stats_prune(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_orderdate")
    S.commit(
        spark,
        o.repartitionByRange(8, "o_orderdate").sortWithinPartitions(
            "o_orderdate"
        ),
        path,
        stats_for=["o_orderdate"],
    )
    hi = o.agg(F.max("o_orderdate")).first()[0]
    rep: dict = {}
    got = S.read_where(
        spark, path, [("o_orderdate", ">=", hi)], report=rep
    )
    assert got.count() >= 1
    assert rep["files_kept"] < rep["files_total"]
    assert all(r["o_orderdate"] >= hi for r in got.collect())
    assert isinstance(hi, datetime.date)


def test_zorder_cluster_by_prunes_on_both_columns(spark, sf_dir, tmp_path):
    """cluster_by Z-orders the write, so a point predicate on EITHER
    cluster column skips most files — the property hive partitioning
    (one hierarchy) can't give."""
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    S.commit(
        spark,
        o,
        path,
        stats_for=["o_custkey", "o_totalprice"],
        cluster_by=["o_custkey", "o_totalprice"],
        n_files=16,
    )
    mid_cust = o.approxQuantile("o_custkey", [0.5], 0.01)[0]
    mid_price = o.approxQuantile("o_totalprice", [0.5], 0.01)[0]
    for col, val in (
        ("o_custkey", int(mid_cust)),
        ("o_totalprice", float(mid_price)),
    ):
        rep: dict = {}
        got = S.read_where(spark, path, [(col, "==", val)], report=rep)
        # correctness vs plain filter
        assert (
            got.count()
            == S.read(spark, path).filter(F.col(col) == val).count()
        )
        # each column's point predicate skips a decent share of files
        assert rep["files_kept"] <= rep["files_total"] // 2, (col, rep)


def test_append_carries_stats_and_compact_recollects(
    spark, sf_dir, tmp_path
):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    half = o.filter(F.col("o_orderkey") % 2 == 0)
    rest = o.filter(F.col("o_orderkey") % 2 == 1)
    S.commit(
        spark,
        half.repartitionByRange(4, "o_orderkey"),
        path,
        stats_for=["o_orderkey"],
    )
    S.commit(
        spark,
        rest.repartitionByRange(4, "o_orderkey"),
        path,
        mode="append",
        stats_for=["o_orderkey"],
    )
    snap = S.load_snapshot(path)
    assert len(snap.file_stats) >= 8  # both commits' files carry stats
    total = o.count()
    assert S.read(spark, path).count() == total
    S.compact(spark, path)
    snap2 = S.load_snapshot(path)
    assert snap2.file_stats and snap2.stats_cols == ["o_orderkey"]
    # stats describe the *rewritten* files, and scans stay correct
    assert set(snap2.file_stats) != set(snap.file_stats)
    rep: dict = {}
    lo = o.agg(F.min("o_orderkey")).first()[0]
    got = S.read_where(spark, path, [("o_orderkey", "==", lo)], report=rep)
    assert got.count() == 1
    assert rep["files_total"] == len(snap2.file_stats)


def test_metadata_only_table_stats(spark, sf_dir, tmp_path):
    """COUNT/MIN/MAX straight from the manifest — no data-file reads."""
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice")
    S.commit(
        spark,
        o.repartition(4),
        path,
        stats_for=["o_orderkey", "o_totalprice"],
    )
    S.commit(
        spark,
        o.withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000),
        path,
        mode="append",
        stats_for=["o_orderkey", "o_totalprice"],
    )
    st = S.table_stats(path)
    assert st["rows"] == 2 * o.count()
    agg = o.agg(
        F.min("o_orderkey"), F.max("o_orderkey"), F.min("o_totalprice"),
        F.max("o_totalprice"),
    ).first()
    assert st["cols"]["o_orderkey"]["min"] == agg[0]
    assert st["cols"]["o_orderkey"]["max"] == agg[1] + 1_000_000
    assert st["cols"]["o_totalprice"] == {"min": agg[2], "max": agg[3]}


def test_table_stats_none_without_stats(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    S.commit(spark, _orders(spark, sf_dir).select("o_orderkey"), path)
    assert S.table_stats(path)["rows"] is None


def test_partitioned_read_where_two_level_prune(spark, tmp_path):
    """Merge-committed tables prune on partition VALUES first, then on
    per-file stats inside surviving partitions; results always equal the
    plain filtered read."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    spec = TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("pk", IntegerType(), False),
                StructField("amt", DoubleType(), False),
                StructField("part", StringType(), False),
            ]
        ),
        primary_key="pk",
        partition_by=("part",),
    )
    path = str(tmp_path / "t")
    rows = [(i, float(i), f"p{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "pk int, amt double, part string")
    S.merge_commit(spark, df, path, spec, stats_for=["amt"])
    snap = S.load_snapshot(path)
    assert snap.stats_cols == ["amt"] and snap.file_stats

    # partition-value pruning: equality on the partition column
    rep: dict = {}
    got = S.read_where(spark, path, [("part", "==", "p1")], report=rep)
    assert got.count() == 30
    assert rep["files_kept"] < rep["files_total"]

    # file-stat pruning inside partitions: amt is 0..89, one file per
    # partition -> a tight range hits a subset
    rep2: dict = {}
    got2 = S.read_where(spark, path, [("amt", ">=", 85.0)], report=rep2)
    want2 = S.read(spark, path).filter(F.col("amt") >= 85.0).count()
    assert got2.count() == want2 > 0

    # merge inherits stat columns without re-requesting them
    upd = spark.createDataFrame(
        [(1, 500.0, "p1")], "pk int, amt double, part string"
    )
    S.merge_commit(spark, upd, path, spec)
    snap2 = S.load_snapshot(path)
    assert snap2.stats_cols == ["amt"]
    rep3: dict = {}
    got3 = S.read_where(spark, path, [("amt", ">=", 400.0)], report=rep3)
    assert [r["pk"] for r in got3.collect()] == [1]
    assert rep3["files_kept"] == 1  # only the rewritten p1 file survives
    # carried partitions kept their stats (total files all have entries)
    assert rep3["files_total"] == len(snap2.file_stats)


def test_partitioned_delete_keeps_stats(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    spec = TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("pk", IntegerType(), False),
                StructField("amt", DoubleType(), False),
                StructField("part", StringType(), False),
            ]
        ),
        primary_key="pk",
        partition_by=("part",),
    )
    path = str(tmp_path / "t")
    rows = [(i, float(i), f"p{i % 2}") for i in range(40)]
    df = spark.createDataFrame(rows, "pk int, amt double, part string")
    S.merge_commit(spark, df, path, spec, stats_for=["amt"])
    S.delete_where(spark, path, "amt < 10.0")
    snap = S.load_snapshot(path)
    assert snap.stats_cols == ["amt"]
    got = S.read_where(spark, path, [("amt", "<", 100.0)])
    assert got.count() == 30  # 40 - 10 deleted
    st = S.table_stats(path)
    assert st["rows"] == 30
    assert st["cols"]["amt"]["min"] == 10.0


def test_bloom_index_prunes_point_lookups(spark, sf_dir, tmp_path):
    """On an unsorted layout, min/max spans everything — only the Bloom
    filter can prune a point lookup. Absent keys touch zero files."""
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    S.commit(
        spark,
        o.repartition(8),  # random placement: stats won't prune
        path,
        stats_for=["o_orderkey"],
        bloom_for=["o_orderkey"],
    )
    some_key = o.agg(F.min("o_orderkey")).first()[0]
    rep: dict = {}
    got = S.read_where(
        spark, path, [("o_orderkey", "==", some_key)], report=rep
    )
    assert got.count() == 1
    # one file truly holds the key; fpp=1% over 8 files ⇒ rarely >2 kept
    assert rep["files_kept"] <= 3 < rep["files_total"]

    rep2: dict = {}
    got2 = S.read_where(
        spark, path, [("o_orderkey", "==", -99999)], report=rep2
    )
    assert got2.count() == 0
    assert rep2["files_kept"] == 0  # definite miss in every bloom


def test_bloom_survives_append_and_compact(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    a = o.filter(F.col("o_orderkey") % 2 == 0)
    b = o.filter(F.col("o_orderkey") % 2 == 1)
    S.commit(spark, a.repartition(3), path, bloom_for=["o_orderkey"])
    S.commit(
        spark, b.repartition(3), path, mode="append",
        bloom_for=["o_orderkey"],
    )
    snap = S.load_snapshot(path)
    assert len(snap.file_blooms) >= 6
    key = o.agg(F.max("o_orderkey")).first()[0]
    rep: dict = {}
    got = S.read_where(spark, path, [("o_orderkey", "==", key)], report=rep)
    assert got.count() == 1
    assert rep["files_kept"] < rep["files_total"]  # appended blooms bite
    S.compact(spark, path)
    snap2 = S.load_snapshot(path)
    assert snap2.bloom_cols == ["o_orderkey"]
    # blooms were rebuilt for the rewritten layout: lookups stay correct
    # and a definite miss still prunes every file
    assert S.read_where(
        spark, path, [("o_orderkey", "==", key)]
    ).count() == 1
    rep2: dict = {}
    assert S.read_where(
        spark, path, [("o_orderkey", "==", -5)], report=rep2
    ).count() == 0
    assert rep2["files_kept"] == 0


def test_in_predicate_prunes_and_matches(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    S.commit(
        spark,
        o.repartitionByRange(8, "o_orderkey").sortWithinPartitions(
            "o_orderkey"
        ),
        path,
        stats_for=["o_orderkey"],
        bloom_for=["o_orderkey"],
    )
    lo, hi = o.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    rep: dict = {}
    got = S.read_where(
        spark, path, [("o_orderkey", "in", [lo, hi])], report=rep
    )
    assert got.count() == 2
    assert rep["files_kept"] <= 3  # only the two end files (+fpp slack)
    want = sorted(
        r["o_orderkey"]
        for r in S.read(spark, path)
        .filter(F.col("o_orderkey").isin([lo, hi]))
        .collect()
    )
    assert sorted(r["o_orderkey"] for r in got.collect()) == want
    # all-absent IN list: blooms prove a definite miss everywhere
    rep2: dict = {}
    assert (
        S.read_where(
            spark, path, [("o_orderkey", "in", [-1, -2])], report=rep2
        ).count()
        == 0
    )
    assert rep2["files_kept"] == 0


def _tspec(fields_ddl: str, partition_by: tuple, pk: str = "pk"):
    from pyspark.sql.types import _parse_datatype_string

    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        TableSpec,
    )

    return TableSpec(
        name="t",
        schema=_parse_datatype_string(fields_ddl),
        primary_key=pk,
        partition_by=partition_by,
    )


def test_bloom_type_mismatched_literal_fails_safe(spark, sf_dir, tmp_path):
    """A float literal that equals an int key must NOT be bloom-pruned:
    read_where(k == 5.0) equals read().filter(k == 5.0). Canonical
    hashing (integral float -> int, bool -> int) keeps the bloom's
    documented results-equal-a-plain-scan guarantee."""
    path = str(tmp_path / "t")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    S.commit(spark, o.repartition(4), path, bloom_for=["o_orderkey"])
    key = o.agg(F.min("o_orderkey")).first()[0]
    want = S.read(spark, path).filter(
        F.col("o_orderkey") == float(key)
    ).count()
    assert want == 1
    got = S.read_where(spark, path, [("o_orderkey", "==", float(key))])
    assert got.count() == want
    # IN branch with a mixed-type list behaves the same
    got2 = S.read_where(
        spark, path, [("o_orderkey", "in", [float(key), -1.0])]
    )
    assert got2.count() == want
    # a genuinely fractional literal still prunes everything (no int row
    # can equal 0.5) AND the residual filter keeps it correct either way
    assert (
        S.read_where(spark, path, [("o_orderkey", "==", key + 0.5)]).count()
        == 0
    )


def test_bool_partition_pruning_parses_literals(spark, tmp_path):
    """bool("false") is True in Python — the partition pruner must parse
    hive bool partition strings, not str-construct them. == False keeps
    the flag=false partition; unparseable values fail open."""
    spec = _tspec("pk int, amt double, flag boolean", ("flag",))
    path = str(tmp_path / "t")
    rows = [(i, float(i), i % 2 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, "pk int, amt double, flag boolean")
    S.merge_commit(spark, df, path, spec)
    for val, n in ((False, 10), (True, 10)):
        rep: dict = {}
        got = S.read_where(spark, path, [("flag", "==", val)], report=rep)
        assert got.count() == n
        assert rep["files_kept"] < rep["files_total"]  # other side pruned
        assert all(r["flag"] is val for r in got.collect())
    rep2: dict = {}
    got2 = S.read_where(spark, path, [("flag", "in", [False])], report=rep2)
    assert got2.count() == 10 and rep2["files_kept"] < rep2["files_total"]


def test_carried_stats_survive_sibling_prefix_dirs(spark, tmp_path):
    """Partition values '1' and '10' produce dirs p=1 and p=10; after a
    merge rewrites ONLY p=10, the carried p=1 stats filter must match on
    directory boundaries — a bare prefix match would carry stale entries
    for p=10's replaced files and silently disable metadata-only
    aggregates (table_stats rows=None)."""
    spec = _tspec("pk int, amt double, part string", ("part",))
    path = str(tmp_path / "t")
    rows = [(i, float(i), "1" if i < 10 else "10") for i in range(20)]
    df = spark.createDataFrame(rows, "pk int, amt double, part string")
    S.merge_commit(spark, df, path, spec, stats_for=["amt"])
    # rewrite only the p=10 partition; p=1 carries by reference
    upd = spark.createDataFrame(
        [(15, 999.0, "10")], "pk int, amt double, part string"
    )
    S.merge_commit(spark, upd, path, spec)
    st = S.table_stats(path)
    assert st["rows"] == 20
    assert st["cols"]["amt"] == {"min": 0.0, "max": 999.0}
    # and the skipping read still equals the plain filtered scan
    got = S.read_where(spark, path, [("amt", ">=", 900.0)])
    assert [r["pk"] for r in got.collect()] == [15]


def test_multicolumn_zorder_with_string_column_skips_both(
    spark, tmp_path
):
    """Z-order over (string, numeric): rank boundaries for the string
    side come from a bounded sample; files must then cover narrow
    windows on BOTH columns so predicates on either skip files."""
    from pyspark.sql import functions as F

    rows = spark.range(4000).select(
        F.concat(
            F.lit("cat_"), F.lpad((F.col("id") % 40).cast("string"), 2, "0")
        ).alias("cat"),
        (F.col("id") * 37 % 1000).alias("num"),
        F.col("id").alias("pk"),
    )
    path = str(tmp_path / "t")
    S.commit(
        spark, rows, path,
        stats_for=["cat", "num"], cluster_by=["cat", "num"], n_files=16,
    )
    rep_s: dict = {}
    got_s = S.read_where(
        spark, path, [("cat", "==", "cat_07")], report=rep_s
    )
    assert got_s.count() == 100
    assert rep_s["files_kept"] < rep_s["files_total"], rep_s
    rep_n: dict = {}
    got_n = S.read_where(spark, path, [("num", "<", 100)], report=rep_n)
    assert got_n.count() == rows.filter("num < 100").count()
    assert rep_n["files_kept"] < rep_n["files_total"], rep_n


def test_optimize_zorder_recluster_enables_skipping(spark, tmp_path):
    """Delta's OPTIMIZE ... ZORDER BY as compact(cluster_by=...): a
    table committed in insertion order (no locality) is reclustered by
    the maintenance op — same rows, fresh files, and read_where
    skipping starts to bite on the cluster column."""
    from pyspark.sql import functions as F

    rows = spark.range(4000).select(
        F.col("id").alias("pk"),
        (F.col("id") * 2654435761 % 1000).alias("num"),
    )
    path = str(tmp_path / "t")
    # scattered insertion order: every file spans ~the full num range
    S.commit(spark, rows.repartition(16), path, stats_for=["num"])
    rep0: dict = {}
    S.read_where(spark, path, [("num", "<", 50)], report=rep0).count()
    assert rep0["files_kept"] == rep0["files_total"]  # nothing skips

    v = S.compact(spark, path, cluster_by=["num"], n_files=16)
    rep1: dict = {}
    got = S.read_where(spark, path, [("num", "<", 50)], report=rep1)
    assert rep1["files_kept"] < rep1["files_total"]  # skipping bites
    assert got.count() == rows.filter("num < 50").count()
    assert S.read(spark, path, v).count() == 4000  # rows untouched

    # partitioned variant: cluster within partitions
    spec = _tspec("pk int, amt double, part string", ("part",))
    pp = str(tmp_path / "pt")
    pdf = spark.range(2000).select(
        F.col("id").cast("int").alias("pk"),
        (F.col("id") * 2654435761 % 500).cast("double").alias("amt"),
        (F.col("id") % 2).cast("string").alias("part"),
    )
    S.merge_commit(spark, pdf, pp, spec, stats_for=["amt"])
    S.compact(spark, pp, cluster_by=["amt"])
    assert S.read(spark, pp).count() == 2000
    got = S.read_where(
        spark, pp, [("part", "==", "1"), ("amt", "<", 10.0)]
    )
    assert got.count() == pdf.filter("part = '1' and amt < 10").count()


def test_null_count_pruning(spark, tmp_path):
    """IS NULL / IS NOT NULL predicates prune from recorded per-file
    null counts: a no-null file never scans for is_null, an all-null
    file never scans for not_null, and results always equal the
    unpruned filter."""
    path = str(tmp_path / "t")
    # file A: no nulls            file B: mixed           file C: all null
    a = [(i, float(i)) for i in range(100)]
    b = [(100 + i, float(i) if i % 2 else None) for i in range(100)]
    c = [(200 + i, None) for i in range(100)]
    schema = "id long, v double"
    df = spark.createDataFrame(a + b + c, schema)
    S.commit(
        spark, spark.createDataFrame(a, schema).coalesce(1), path,
        stats_for=["v"],
    )
    for grp in (b, c):
        S.commit(
            spark, spark.createDataFrame(grp, schema).coalesce(1), path,
            mode="append", stats_for=["v"],
        )
    snap = S.load_snapshot(path)
    assert snap.file_stats and len(snap.file_stats) == 3

    rep: dict = {}
    got = S.read_where(spark, path, [("v", "is_null", None)], report=rep)
    want = df.filter(F.col("v").isNull())
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    # the no-null file is pruned at planning time
    assert rep["files_kept"] == 2 and rep["files_total"] == 3

    rep = {}
    got = S.read_where(spark, path, [("v", "not_null", None)], report=rep)
    want = df.filter(F.col("v").isNotNull())
    assert sorted(r["id"] for r in got.collect()) == sorted(
        r["id"] for r in want.collect()
    )
    # the all-null file is pruned at planning time
    assert rep["files_kept"] == 2 and rep["files_total"] == 3

    # composes with value conjuncts: not_null + range hits one file
    rep = {}
    got = S.read_where(
        spark, path,
        [("v", "not_null", None), ("id", "<", 100)],
        report=rep,
    )
    assert got.count() == 100
    # stats were only collected for v, so id can't prune — but the
    # all-null-v file still drops
    assert rep["files_kept"] == 2
