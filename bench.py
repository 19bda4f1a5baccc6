"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "headline_queries_total", "value": <sec>, "unit": "sec",
   "queries": {"pricing_summary": <sec>, ...}, "sf": <float>, "reps": 3}

Per-query time is wall-clock of plan construction + execution + collect on a
warm session (JVM/session startup excluded — the reference's baseline is
dominated by orchestration overhead we deliberately do not reproduce).
Every leg runs REPS times and reports the per-leg MINIMUM, so cross-round
deltas are signal rather than run-to-run jitter; "value" is the sum of
per-leg minima. The leg set (headline-marked catalog queries + the two job
legs) is frozen as of round 3 — keep it stable so rounds compare leg-for-leg.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import get_spark


def _calibration(spark) -> dict[str, float]:
    """Fixed host-speed anchor, no code under test (r12 verdict task 2).

    BENCH absolute numbers on this host swing 10-33% on frozen code
    (TUNING.md round 12: same-day runs moved untouched legs 1.70->2.30 s),
    so every bench run now records three deterministic micro-legs — pure
    whole-stage-codegen CPU, a parquet write, and a parquet scan-agg —
    at the START and END of the run. Future round-over-round comparisons
    divide by these anchors to separate host drift from code changes.
    Constant inputs, constant plans, nothing from the package under test.
    Each leg is min-of-2 within the call so the anchor measures ambient
    host speed, not first-plan JIT warmup (measured 8.0 s cold vs 1.1 s
    steady-state for the CPU leg in one session).
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="bench_calib_")
    try:
        for _ in range(2):
            # CPU: 10M-row codegen-only hash-agg (xxhash64 + modulo).
            t0 = time.time()
            spark.range(10_000_000).select(
                (F.xxhash64("id") % 1024).alias("b"), F.col("id")
            ).groupBy("b").agg(F.sum("id"), F.count("*")).collect()
            took = round(time.time() - t0, 3)
            out["cpu_agg_10m"] = min(out.get("cpu_agg_10m", took), took)
            # IO write: 5M rows, two columns, fixed 8-file layout.
            t0 = time.time()
            spark.range(5_000_000).select(
                "id", (F.col("id") * 2654435761 % 97).alias("v")
            ).repartition(8).write.mode("overwrite").parquet(f"{work}/t")
            took = round(time.time() - t0, 3)
            out["io_write_5m"] = min(out.get("io_write_5m", took), took)
            # IO scan-agg: read it back, aggregate both columns.
            t0 = time.time()
            spark.read.parquet(f"{work}/t").groupBy("v").agg(
                F.sum("id"), F.count("*")
            ).collect()
            took = round(time.time() - t0, 3)
            out["io_scan_5m"] = min(out.get("io_scan_5m", took), took)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(f"# calibration: {out}", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    # Warm one-time session machinery so the FIRST timed query pays only
    # its own plan, not class-loading: exchange/aggregate/window/broadcast
    # operator classes, the parquet reader/codec stack, and the Python
    # worker pool for Arrow-batched stages (per-query timings exclude
    # session startup by policy, see module docstring).
    from pyspark.sql import Window as _W
    from pyspark.sql import functions as _F

    warm = spark.range(10_000).select("id", (_F.col("id") % 7).alias("k"))
    (
        warm.groupBy("k")
        .agg(_F.sum("id").alias("s"))
        .join(_F.broadcast(spark.range(7).withColumnRenamed("id", "k")), "k")
        .withColumn("r", _F.row_number().over(_W.partitionBy("k").orderBy("s")))
        .collect()
    )
    warm.withColumn(
        "e", _F.explode(_F.array(_F.lit(1), _F.lit(2)))
    ).groupBy("e").count().collect()
    warm.limit(64).mapInPandas(lambda it: it, "id long, k long").count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).limit(1).collect()

    calibration_start = _calibration(spark)

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for rep in range(reps):
        for name, qd in catalog.CATALOG.items():
            if not qd.headline:
                continue
            t0 = time.time()
            df = qd.builder(spark, sf_dir)
            n = len(df.collect())
            took = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, took), took)
            print(
                f"# [{rep + 1}/{reps}] {name}: {took:.3f}s ({n} rows)",
                file=sys.stderr,
            )

    # The reference's own workload shape, for direct BASELINE comparison:
    # CSV read -> validate -> dedup -> MERGE into partitioned table
    # (orders_etl.py took ~43 s for 7,500 rows on Glue; BASELINE.md).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.jobs import (
        run_etl_job,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
        ORDERS,
        load_table,
    )

    work = tempfile.mkdtemp(prefix="bench_etl_")
    try:
        raw = (
            load_table(spark, sf_dir, "orders")
            .select(
                (F.col("o_orderkey") % 100).alias("order_num"),
                F.col("o_orderkey").alias("order_id"),
                F.col("o_custkey").alias("user_id"),
                F.col("o_orderdate").alias("order_timestamp"),
                F.col("o_totalprice").alias("total_amount"),
                # month granularity: the synthetic orders span ~6.5 years of
                # distinct days; daily dirs would mean ~2400 partitions of
                # ~60 rows — a partitioning-design error at this density
                # (the reference's real data has 500 rows/day over 15 days)
                F.date_format("o_orderdate", "yyyy-MM").alias("date"),
            )
        )
        n_raw = raw.count()
        raw.write.option("header", True).mode("overwrite").csv(f"{work}/raw")
        for rep in range(reps):
            t0 = time.time()
            res = run_etl_job(
                spark, ORDERS, f"{work}/raw/*.csv", f"{work}/wh{rep}",
                f"{work}/rej{rep}", "bench",
            )
            took = round(time.time() - t0, 3)
            timings["etl_orders_batch"] = min(
                timings.get("etl_orders_batch", took), took
            )
            print(
                f"# [{rep + 1}/{reps}] etl_orders_batch: {took:.3f}s "
                f"({res.rows_written}/{n_raw} rows)",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # The training-data curation job end-to-end: quality gate -> exact +
    # MinHash near dedup -> decontamination -> sequence packing -> atomic
    # snapshot publish (etl/datapipe.py)
    from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.datapipe import (
        run_curation_job,
    )

    work = tempfile.mkdtemp(prefix="bench_curate_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        ev = docs.filter(F.col("doc_id") % 50 == 17)
        tr = docs.filter(F.col("doc_id") % 50 != 17)
        for rep in range(reps):
            t0 = time.time()
            res = run_curation_job(
                spark, tr, f"{work}/corpus{rep}", ctx_tokens=64,
                eval_docs=ev, contamination_max=0.5, contamination_ngram=3,
            )
            took = round(time.time() - t0, 3)
            timings["curation_job_batch"] = min(
                timings.get("curation_job_batch", took), took
            )
            print(
                f"# [{rep + 1}/{reps}] curation_job_batch: {took:.3f}s "
                f"({res.n_curated}/{res.n_input} docs kept, "
                f"{res.n_packs} packs)",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # Non-headline extras: the IVM family + deletion-vector commits,
    # timed with the same reps/min policy but reported ALONGSIDE the
    # frozen 29-leg headline total (never inside it) — the O(batch)
    # maintenance claim gets a measured number, and regressions in the
    # snapshot commit path become visible round over round.
    extra_legs = [
        "incremental_agg",
        "incremental_minmax",
        "incremental_topk",
        "join_view_maintenance",
        "dv_delete_sim",
        "dv_partitioned_delete_sim",
        # round-5 write-path additions: scoped OPTIMIZE, column-mapping
        # read/write seam, manifest NDV sketch collection
        "optimize_scoped_sim",
        "column_mapping_sim",
        "ndv_stats_sim",
        # round-6: the partitioned write paths learned the mapping seam
        "column_mapping_part_sim",
        # round-6: snapshot-tail streaming source end-to-end (3 commits
        # + compact + availableNow drain through the Python data source)
        "snapshot_tail_sim",
        # round-6: ER survivorship + cross-corpus decontamination
        "er_golden_records",
        "decontaminate_train_bench",
        # round-6: change-data-feed source end-to-end (baseline +
        # append + DV delete + DV update + silent OPTIMIZE, drained
        # and re-aggregated) and CDF-driven MIN/MAX view maintenance
        "snapshot_cdf_sim",
        "table_mv_maintenance_sim",
        # round-6: AVI/MJPEG frame sampling through the real JPEG path
        "video_frame_stats",
        # round-8: the CDC-apply hot path priced round-over-round —
        # write-time CDC capture at MERGE (merge_cdc_sim), APPLY
        # CHANGES INTO a replica with literal-key DV pruning
        # (cdc_replicate_sim), and the batch table_changes surface
        # (table_changes_batch)
        "merge_cdc_sim",
        "cdc_replicate_sim",
        "table_changes_batch",
        # round-8: progressive-JPEG decode leg (multi-scan SOF2)
        "jpeg_progressive_stats",
        # round-9: the PNG/GIF variant decode paths (palette, Adam7,
        # 16-bit, interlaced GIF, 1-bit) and 12-bit grayscale JPEG
        # priced round-over-round
        "png_variants_stats",
        "jpeg12_decode_stats",
        "bmp_wav_variants_stats",
        # round-10: the scale-safe ANN near-dup form (n_planes ~ log2 N,
        # two OR-composed bands) priced alongside the frozen single-band
        # embedding_near_dup_pairs headline leg so the Σ bucket² fix has
        # a round-over-round number; and the 4-component Adobe CMYK/YCCK
        # JPEG decode leg
        "embedding_near_dup_scaled",
        "jpeg_cmyk_stats",
        # round-11: arithmetic-coded JPEG decode (SOF9 + SOF10, the
        # T.81 QM coder) priced round-over-round
        "jpeg_arith_stats",
    ]
    extras: dict[str, float] = {}
    for rep in range(reps):
        for name in extra_legs:
            qd = catalog.CATALOG[name]
            t0 = time.time()
            n = len(qd.builder(spark, sf_dir).collect())
            took = round(time.time() - t0, 3)
            extras[name] = min(extras.get(name, took), took)
            print(
                f"# [{rep + 1}/{reps}] extra {name}: {took:.3f}s "
                f"({n} rows)",
                file=sys.stderr,
            )

    # Streaming IVM twins: wall-time of the exactly-once MIN/MAX and
    # TOP-K maintenance (fact mirror + state) over a 3-batch change
    # feed. Batch 1 is the seed build; batches 2-3 carry
    # deletes/updates — the slice replace path whose O(batch) claim
    # the mirror commit redesign makes. Fresh dirs per rep (a stream
    # can't re-run its own feed); leg value = min over reps.
    #
    # MEASUREMENT CHANGE (r15, verdict task 4, documented in
    # OPTIMIZATION_r15.md): all three feed files are written up front
    # and ONE paced availableNow query (maxFilesPerTrigger=1) drains
    # them as three micro-batches, instead of starting a fresh
    # query per feed file. The per-batch exactly-once contract is
    # unchanged — same three foreachBatch invocations, same three
    # atomic state commits, same batch ids — but the query
    # start/teardown machinery (~0.9 s/batch measured in r14) is paid
    # once per leg, which is how a production stream actually runs
    # (one long-lived query, not one query per batch). r14-methodology
    # numbers for comparison are in OPTIMIZATION_r15.md's baseline
    # table. File mtimes are staggered so the file source's
    # timestamp ordering preserves the batch sequence (EWMA's feed
    # contract is order-strict).
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        stream_cm_maintenance,
        stream_ewma_maintenance,
        stream_hll_maintenance,
        stream_minmax_maintenance,
        stream_topk_maintenance,
    )

    feed_rows = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 8 == 0)
        .select(
            (F.col("o_custkey") % 500).cast("string").alias("k"),
            F.col("o_totalprice").cast("double").alias("v"),
            F.col("o_orderkey").alias("ok"),
        )
        .collect()
    )
    b1 = [f"{r['k']},I,,{r['v']!r}" for r in feed_rows]
    b2 = [
        f"{r['k']},D,{r['v']!r}," for r in feed_rows if r["ok"] % 40 == 0
    ] + [
        f"{r['k']},I,,{r['v'] + 1000.0!r}"
        for r in feed_rows
        if r["ok"] % 56 == 0
    ]
    b3 = [
        f"{r['k']},U,{r['v']!r},{r['v'] / 2!r}"
        for r in feed_rows
        if r["ok"] % 48 == 8
    ]
    def _write_feed(raw: str, header: str, batches) -> None:
        """All feed files up front, mtimes staggered 2 s apart so the
        file source's (timestamp, path) ordering replays them in batch
        order under maxFilesPerTrigger=1."""
        os.makedirs(raw)
        now = time.time()
        for bi, rows in enumerate(batches, start=1):
            p = os.path.join(raw, f"b{bi}.csv")
            with open(p, "w") as f:
                f.write(header + "\n")
                f.write("\n".join(rows) + "\n")
            os.utime(p, (now, now - 2.0 * (len(batches) - bi)))

    def _paced_reader(schema_ddl: str, raw: str):
        return (
            spark.readStream.schema(schema_ddl)
            .option("header", True)
            .option("maxFilesPerTrigger", "1")
            .csv(raw)
        )

    stream_reps = min(reps, 2)  # full fresh stream per rep: bound cost
    chg_ddl = "k string, op string, old_val double, new_val double"
    for leg, start in (
        ("stream_minmax_maintenance",
         lambda raw, fp, sp, ck: stream_minmax_maintenance(
             spark, raw, fp, sp, ck)),
        ("stream_topk_maintenance",
         lambda raw, fp, sp, ck: stream_topk_maintenance(
             spark, raw, fp, sp, ck, k=3, buffer=2)),
        # round-6 (r5 verdict task 5): the Count-Min twin shares the
        # change-row feed; its number watches the same slice-replace
        # commit path (no fact mirror — fp unused)
        ("stream_cm_maintenance",
         lambda raw, fp, sp, ck: stream_cm_maintenance(
             spark, raw, sp, ck, depth=4, width=256)),
    ):
        for rep in range(stream_reps):
            work = tempfile.mkdtemp(prefix=f"bench_{leg}_")
            try:
                raw = os.path.join(work, "raw")
                _write_feed(raw, "k,op,old_val,new_val", [b1, b2, b3])
                t0 = time.time()
                q = start(
                    _paced_reader(chg_ddl, raw),
                    os.path.join(work, "fact"),
                    os.path.join(work, "state"),
                    os.path.join(work, "ckpt"),
                )
                q.awaitTermination(600)
                took = round(time.time() - t0, 3)
                n_batches = len(q.recentProgress)
                extras[leg] = min(extras.get(leg, took), took)
                print(
                    f"# [{rep + 1}/{stream_reps}] extra {leg}: {took:.3f}s "
                    f"(one paced run, {n_batches} micro-batches, "
                    f"{len(b1)}+{len(b2)}+{len(b3)} changes)",
                    file=sys.stderr,
                )
            finally:
                shutil.rmtree(work, ignore_errors=True)

    # Round-6 (r5 verdict task 5), continued: the HLL and EWMA twins
    # have their own feed schemas — HLL ingests bare (k, v) values
    # (insert-only algebra), EWMA ingests ORDER-STRICT (k, t, x) ticks
    # (one later tick per key per batch; duplicates reject loudly).
    # Their per-batch numbers watch the same scoped slice-replace
    # commit whose cost the sidecar-manifest work bounds to O(batch).
    keyvals: dict[str, int] = {}
    for r in feed_rows:
        keyvals.setdefault(r["k"], int(r["v"] * 100))
    hll_batches = [
        [f"{r['k']},u{r['ok']}" for r in feed_rows],
        [f"{r['k']},u{r['ok'] + (r['ok'] % 2)}" for r in feed_rows],
        [f"{r['k']},w{r['ok']}" for r in feed_rows if r["ok"] % 4 == 0],
    ]
    ewma_batches = [
        [f"{k},{t},{x + 13 * t}" for k, x in sorted(keyvals.items())]
        for t in (1, 2, 3)
    ]
    for leg, header, ddl, batches, start in (
        ("stream_hll_maintenance", "k,v", "k string, v string",
         hll_batches,
         lambda raw, sp, ck: stream_hll_maintenance(spark, raw, sp, ck)),
        ("stream_ewma_maintenance", "k,t,x", "k string, t long, x long",
         ewma_batches,
         lambda raw, sp, ck: stream_ewma_maintenance(spark, raw, sp, ck)),
    ):
        for rep in range(stream_reps):
            work = tempfile.mkdtemp(prefix=f"bench_{leg}_")
            try:
                raw = os.path.join(work, "raw")
                _write_feed(raw, header, batches)
                t0 = time.time()
                q = start(
                    _paced_reader(ddl, raw),
                    os.path.join(work, "state"),
                    os.path.join(work, "ckpt"),
                )
                q.awaitTermination(600)
                took = round(time.time() - t0, 3)
                n_batches = len(q.recentProgress)
                extras[leg] = min(extras.get(leg, took), took)
                print(
                    f"# [{rep + 1}/{stream_reps}] extra {leg}: "
                    f"{took:.3f}s (one paced run, {n_batches} "
                    f"micro-batches, "
                    f"{'+'.join(str(len(x)) for x in batches)} rows)",
                    file=sys.stderr,
                )
            finally:
                shutil.rmtree(work, ignore_errors=True)

    # Indexed phrase search: the z-ordered postings table + term-pruned
    # scan (the documented 100 TB search-index shape, proven in
    # tests/test_fileskip.py / test_search_ivm.py) — timed here so the
    # pruned-query path has a number. The index build is one-time
    # (amortized across queries), so the LEG times only the query:
    # read_where with the phrase's term IN-predicate + the positional
    # join + collect; pruned-file counts go to the log line.
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.ranking import (
        build_postings,
        phrase_search,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
        snapshots as SNAP,
    )

    work = tempfile.mkdtemp(prefix="bench_postings_")
    try:
        docs = load_table(spark, sf_dir, "documents")
        idx_path = os.path.join(work, "postings")
        t0 = time.time()
        SNAP.commit(
            spark, build_postings(docs), idx_path,
            stats_for=["term"], cluster_by=["term"], n_files=64,
        )
        print(
            f"# postings index build (one-time, untimed leg): "
            f"{time.time() - t0:.3f}s",
            file=sys.stderr,
        )
        phrase = ["slow", "hash", "batch"]
        for rep in range(reps):
            rep_stats: dict = {}
            t0 = time.time()
            pruned = SNAP.read_where(
                spark, idx_path, [("term", "in", phrase)],
                report=rep_stats,
            )
            n = len(phrase_search(pruned, phrase).collect())
            took = round(time.time() - t0, 3)
            extras["phrase_search_indexed"] = min(
                extras.get("phrase_search_indexed", took), took
            )
            print(
                f"# [{rep + 1}/{reps}] extra phrase_search_indexed: "
                f"{took:.3f}s ({n} docs, files "
                f"{rep_stats['files_kept']}/{rep_stats['files_total']})",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    calibration_end = _calibration(spark)

    total = round(sum(timings.values()), 3)
    # The driver records only the last ~2000 chars of stdout and parses
    # the JSON line out of that capture — r13's verbose calibration
    # block pushed the line to ~2150 chars and the round's BENCH record
    # came back parsed=null. The line therefore carries a compact
    # 3-float anchor vector ([cpu_agg_10m, io_write_5m, io_scan_5m]
    # mins — exactly what tools/bench_compare.py normalizes by); the
    # start/end detail goes to stderr, and the line self-checks its
    # length (precision trim first, then a loud warning).
    calib = [
        round(min(calibration_start[k], calibration_end[k]), 3)
        for k in ("cpu_agg_10m", "io_write_5m", "io_scan_5m")
    ]
    print(
        f"# calibration detail: start={calibration_start} "
        f"end={calibration_end}",
        file=sys.stderr,
    )
    rec = {
        # big dicts FIRST: the driver keeps the TAIL of stdout, so if a
        # future line ever outgrows the capture anyway, the scalar
        # summary fields at the end still survive in the fragment
        "queries": timings,
        "extra_queries": extras,
        "extra_total": round(sum(extras.values()), 3),
        "sf": sf,
        "reps": reps,
        "calib": calib,
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
    }
    line = json.dumps(rec, separators=(",", ":"))
    if len(line) > 1900:
        rec["queries"] = {k: round(v, 2) for k, v in timings.items()}
        rec["extra_queries"] = {k: round(v, 2) for k, v in extras.items()}
        line = json.dumps(rec, separators=(",", ":"))
    if len(line) > 1900:
        print(
            f"# WARNING: bench line is {len(line)} chars — the driver "
            f"capture may truncate it; trim legs or names",
            file=sys.stderr,
        )
    print(line)


if __name__ == "__main__":
    main()
