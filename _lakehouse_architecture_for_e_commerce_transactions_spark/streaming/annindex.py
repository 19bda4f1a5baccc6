"""Streaming ANN index maintenance: a continuously maintained IVF
(inverted-file) vector index, exactly-once.

The batch operator ``operators/similarity.ivf_topk`` rebuilds its cell
assignment per call; at corpus scale the index must instead be a TABLE
that new embeddings join incrementally:

* the CODEBOOK (centroids) is committed once from a seed corpus and
  then FROZEN — index stability requires it (real systems retrain
  offline and rebuild); queries and inserts share it as a broadcast.
* the INDEX table holds (cell, id, v) rows. Each micro-batch assigns
  its new vectors to their nearest cell (one broadcast cross of
  batch × centroids — O(|batch| · k_cells), never corpus-sized) and
  APPENDS them: no rewrite, no shuffle of existing index rows.
  Small-file debt from many appends is retired by
  ``snapshots.compact`` like any other table.
* exactly-once rides the same (app id, batch id) watermark pattern as
  ``streaming/aggmaint``: the marker travels inside the atomic append,
  replayed batches skip, a lost checkpoint (new app id) rebuilds the
  index from the re-delivered feed at batch 0.

``ivf_index_topk`` is the query path: probe the ``nprobe`` nearest
cells and rank only those rows — a cell equi-join against the
committed index, work proportional to the probed cells' population.
With ``nprobe`` = number of cells it degrades to exact brute force,
which is what the tests exploit to prove the maintained index loses
nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    vectors as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    similarity as SIM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    util as U,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
    _app_id,
    _guard,
    _table_state,
)

EMBEDDING_STREAM_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), False),
    ]
)

INDEX_SCHEMA = StructType(
    [
        StructField("cell", LongType(), True),
        StructField("id", LongType(), True),
        StructField("v", ArrayType(DoubleType()), True),
        StructField("_last_batch", LongType(), True),
        StructField("_app_id", StringType(), True),
    ]
)


def build_ivf_codebook(
    spark: SparkSession,
    corpus: DataFrame,
    codebook_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 37,
) -> int:
    """Commit the frozen centroid table the streaming index assigns
    against (deterministic stride pick, same as the batch operator —
    swap in kmeans_fit seeds for trained centroids)."""
    return S.commit(
        spark, SIM.ivf_centroids(corpus, id_col, vec_col, stride),
        codebook_path,
    )


def read_index(spark: SparkSession, index_path: str) -> DataFrame:
    return (
        S.read(spark, index_path)
        .filter(F.col("cell").isNotNull())
        .select("cell", "id", "v")
    )


def stream_ivf_index_maintenance(
    spark: SparkSession,
    raw_dir: str,
    codebook_path: str,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Maintain the IVF index from JSON-lines embedding files
    (``{"vec_id": n, "embedding": [...]}``) arriving in ``raw_dir``.
    Each applied batch appends its cell-assigned vectors atomically;
    the table IS the index — queryable mid-stream, time-travelable,
    compactable. ``compact_every=N`` folds the per-batch small-file
    debt every N applied batches (amortized layout maintenance).
    Codebook drift under a shifting vector distribution is the OTHER
    lifecycle axis — monitor it with ``ivf_index_recall`` and repair
    with ``check_and_recluster`` on an offline cadence."""
    app = _app_id(checkpoint_dir)
    reader = spark.readStream.schema(EMBEDDING_STREAM_SCHEMA).json(raw_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
            _reject_null_keys,
        )

        _reject_null_keys(
            batch_df,
            F.col("vec_id").isNull() | F.col("embedding").isNull(),
            "stream_ivf_index_maintenance",
        )
        _, last, aid = _table_state(
            spark, index_path, INDEX_SCHEMA, ["cell", "id", "v"]
        )
        skip, rebuild = _guard(batch_id, last, aid, app)
        if skip:
            return
        cents = S.read(spark, codebook_path)
        vecs = batch_df.select(
            F.col("vec_id").alias("id"),
            V.as_double(F.col("embedding")).alias("v"),
        )
        assigned = SIM._assign_cells(vecs, cents, 1).select(
            "cell", "id", "v"
        )
        marker = U.literal_frame(
            spark, [(None, None, None, batch_id, app)], INDEX_SCHEMA
        )
        out = (
            assigned.withColumn(
                "_last_batch", F.lit(batch_id).cast("long")
            )
            .withColumn("_app_id", F.lit(app))
            .unionByName(marker)
        )
        # append = no rewrite of existing index rows; a rebuild (new
        # derivation at batch 0, reading the full re-delivered feed)
        # replaces the table instead
        S.commit(
            spark, out, index_path,
            mode="overwrite" if rebuild else "append",
        )
        if compact_every and (batch_id + 1) % compact_every == 0:
            # aggmaint's fold: layout compaction + watermark-marker
            # collapse (the index accumulates one NULL-cell marker per
            # applied batch like every other state table)
            from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
                _compact_state,
            )

            _compact_state(spark, index_path)

    writer = (
        reader.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def table_ivf_index_maintenance(
    spark: SparkSession,
    table_path: str,
    codebook_path: str,
    index_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    starting_version="earliest",
    available_now: bool = True,
    compact_every: int | None = None,
) -> StreamingQuery:
    """The IVF index as a SECONDARY INDEX of a snapshot table,
    maintained from its CHANGE FEED — the missing delete story:
    ``stream_ivf_index_maintenance`` can only grow, but a vectors
    table takes DV deletes and updates, and an index serving deleted
    ids returns ghosts. Per micro-batch the changes are netted per id
    (latest commit wins, add beats the same rewrite's delete); every
    netted id's old index rows are removed (join-based deletion
    vectors — an update is delete+reinsert by construction), then the
    surviving adds are cell-assigned and appended WITH the batch
    marker. Crash between the two commits replays into a no-op delete
    + the marker append — the aggmaint idempotence contract.

    A rebuild (fresh checkpoint → new derivation id at batch 0) nets
    over the ENTIRE replayed feed, so the overwritten index holds
    exactly the table's live vectors."""
    from pyspark.sql import Window as W

    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
        _reject_null_keys,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
        read_changes_stream,
    )

    app = _app_id(checkpoint_dir)
    feed = read_changes_stream(
        spark, table_path, starting_version=starting_version
    ).select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        "_change_type",
        "_commit_version",
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _reject_null_keys(
            batch_df,
            F.col("vec_id").isNull(),
            "table_ivf_index_maintenance",
        )
        _, last, aid = _table_state(
            spark, index_path, INDEX_SCHEMA, ["cell", "id", "v"]
        )
        skip, rebuild = _guard(batch_id, last, aid, app)
        if skip:
            return
        is_add = F.col("_change_type").isin("insert", "update_postimage")
        w = W.partitionBy("vec_id").orderBy(
            F.col("_commit_version").desc(), is_add.cast("int").desc()
        )
        final = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .cache()
        )
        try:
            adds = final.filter(is_add).select(
                F.col("vec_id").alias("id"),
                V.as_double(F.col("embedding")).alias("v"),
            )
            if last is not None and not rebuild:
                # upsert-by-delete: every netted id's old index rows go
                # (an update reassigns its cell; a delete just goes)
                S.delete_matching_dv(
                    spark,
                    index_path,
                    final.select(F.col("vec_id").alias("id")),
                    ["id"],
                    op="DELETE@ivfmaint",
                )
            cents = S.read(spark, codebook_path)
            assigned = SIM._assign_cells(adds, cents, 1).select(
                "cell", "id", "v"
            )
            marker = U.literal_frame(
                spark, [(None, None, None, batch_id, app)], INDEX_SCHEMA
            )
            out = (
                assigned.withColumn(
                    "_last_batch", F.lit(batch_id).cast("long")
                )
                .withColumn("_app_id", F.lit(app))
                .unionByName(marker)
            )
            S.commit(
                spark, out, index_path,
                mode="overwrite" if rebuild or last is None else "append",
                # id stats + blooms make the per-batch upsert-delete a
                # pruned scan (delete_matching_dv's literal-key path)
                stats_for=["id"], bloom_for=["id"],
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.aggmaint import (
                    _compact_state,
                )

                _compact_state(spark, index_path)
        finally:
            final.unpersist()

    writer = (
        feed.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_topk(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 5,
) -> DataFrame:
    """Top-k over the maintained index: assign each query to its
    ``nprobe`` nearest cells (broadcast centroids), equi-join the index
    on cell, rank the candidates. (qid, cid, cos, rank) — same rounding
    and tie-break contract as the batch similarity operators."""
    cents = S.read(spark, codebook_path)
    q = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    q_cells = (
        SIM._assign_cells(q, cents, nprobe)
        .withColumnRenamed("id", "qid")
        .withColumnRenamed("v", "qv")
    )
    idx = read_index(spark, index_path).select(
        "cell", F.col("id").alias("cid"), F.col("v").alias("cv")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    # no dedup needed: every vector lives in exactly ONE cell (insert
    # assigns n_cells=1), so a (qid, cid) pair appears at most once
    # however many cells the query probes — a distinct here would add
    # a full shuffle of the candidate set for nothing. Duplicate
    # vec_ids in the FEED are a feed contract violation, surfaced (not
    # masked) by the index row count.
    return (
        idx.join(F.broadcast(q_cells), "cell")
        .withColumn(
            "cos", F.round(V.cosine(F.col("qv"), F.col("cv")), round_to)
        )
        .select("qid", "cid", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_index_recall(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    probe_queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Recall@k of the pruned (``nprobe``-cell) search against exact
    brute force over the SAME index rows (``nprobe`` = all cells
    degrades ``ivf_index_topk`` to exhaustive search, so the comparison
    needs no second code path). This is the drift monitor: a frozen
    codebook keeps assigning well only while the vector distribution
    matches what it was trained on — as drifted vectors scatter across
    cells trained elsewhere, a query's true neighbors increasingly
    live in unprobed cells and recall decays. Cost: one probe-set
    query at ``nprobe`` + one at all-cells — run it on a small probe
    sample on a monitoring cadence, not per batch."""
    n_cells = S.read(spark, codebook_path).count()
    approx = ivf_index_topk(
        spark, index_path, codebook_path, probe_queries,
        k=k, nprobe=nprobe, id_col=id_col, vec_col=vec_col,
    )
    exact = ivf_index_topk(
        spark, index_path, codebook_path, probe_queries,
        k=k, nprobe=n_cells, id_col=id_col, vec_col=vec_col,
    )
    total = exact.count()
    if total == 0:
        return 1.0
    hits = approx.join(
        exact.select("qid", "cid"), ["qid", "cid"], "left_semi"
    ).count()
    return hits / total


def recluster_ivf(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    stride: int = 37,
) -> None:
    """Retrain the codebook on the CURRENT index vectors and re-assign
    every index row to the new cells — the repair for codebook drift.
    O(index) by nature (every vector re-assigns), which is exactly why
    it runs on a measured trigger (``check_and_recluster``) instead of
    per batch; the streaming appends stay O(batch).

    The replay watermark (max applied batch + app id) is re-stamped
    onto the rebuilt table, so the maintenance stream resumes exactly
    where it left off. Codebook commits first, then the index: a query
    racing the two commits may probe with the new centroids against the
    old assignment — degraded recall for that one read, never an
    invalid result (candidates are real index rows with true cosines).
    Run on the same single-maintainer cadence as ``compact``."""
    cur, last, app = _table_state(
        spark, index_path, INDEX_SCHEMA, ["cell", "id", "v"]
    )
    if last is None:
        return  # empty/uncreated index: nothing to retrain on
    cur = cur.localCheckpoint(eager=True)  # pin: two commits, one read
    cents = SIM.ivf_centroids(
        cur.select(F.col("id").alias("vec_id"), F.col("v").alias("embedding")),
        "vec_id", "embedding", stride,
    )
    S.commit(spark, cents, codebook_path, mode="overwrite")
    assigned = SIM._assign_cells(
        cur.select("id", "v"), S.read(spark, codebook_path), 1
    ).select("cell", "id", "v")
    marker = U.literal_frame(
        spark, [(None, None, None, last, app)], INDEX_SCHEMA
    )
    out = (
        assigned.withColumn("_last_batch", F.lit(last).cast("long"))
        .withColumn("_app_id", F.lit(app))
        .unionByName(marker)
    )
    S.commit(spark, out, index_path, mode="overwrite")


def check_and_recluster(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    probe_queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    threshold: float = 0.8,
    stride: int = 37,
) -> tuple[float, bool]:
    """The measured drift trigger: evaluate recall@k of the pruned
    search on ``probe_queries`` and re-cluster (codebook retrain +
    full re-assign) only when it falls below ``threshold``. Returns
    (observed recall, whether a re-cluster ran). Wire it to whatever
    cadence the corpus drifts on — per N batches, hourly, on an
    alerting hook — the point is that rebuild cost is paid on
    EVIDENCE, not on a timer guess."""
    recall = ivf_index_recall(
        spark, index_path, codebook_path, probe_queries, k, nprobe
    )
    if recall >= threshold:
        return recall, False
    recluster_ivf(spark, index_path, codebook_path, stride)
    return recall, True


# ---------------------------------------------------------------------------
# IVF-PQ lifecycle: the COMPRESSED index has a second stale axis.
# check_and_recluster repairs drifted IVF centroids; the PQ codebooks
# (operators/pq.py) quantize per-subspace geometry and go stale the
# same way — drifted vectors land far from every trained centroid, ADC
# distances flatten, and the compressed ranking (and the refine short
# list fed from it) degrades even when the right cells are probed.
# These helpers version the PQ codebooks as a snapshot table and close
# the same measure → retrain → atomic-replace loop over BOTH artifacts.
# ---------------------------------------------------------------------------

PQ_CODEBOOK_SCHEMA = StructType(
    [
        StructField("j", LongType(), True),
        StructField("code", LongType(), True),
        StructField("cent", ArrayType(DoubleType()), True),
    ]
)


def commit_pq_codebooks(
    spark: SparkSession,
    pq_path: str,
    vectors: DataFrame,
    m: int = 1,
    k_codes: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Train per-subspace PQ codebooks (operators/pq.py
    pq_codebooks_kmeans) and commit them as a snapshot table —
    m·k_codes rows, bounded — so queries, the ADC recall monitor and
    the retrain path share ONE versioned artifact with atomic replace
    and time travel, exactly like the IVF centroid codebook."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        pq as PQ,
    )

    books = PQ.pq_codebooks_kmeans(
        vectors, id_col, vec_col, m=m, k_codes=k_codes, iters=iters
    )
    rows = [
        (j, ci, [float(x) for x in cent])
        for j, book in enumerate(books)
        for ci, cent in enumerate(book)
    ]
    return S.commit(
        spark,
        spark.createDataFrame(rows, PQ_CODEBOOK_SCHEMA),
        pq_path,
        mode="overwrite",
    )


def read_pq_codebooks(spark: SparkSession, pq_path: str):
    """Stored codebooks → the nested-list driver form the PQ operators
    take. A bounded collect: m·k_codes rows, same budget class as the
    IVF centroid broadcast."""
    by_j: dict[int, dict[int, list[float]]] = {}
    for r in S.read(spark, pq_path).collect():
        by_j.setdefault(int(r["j"]), {})[int(r["code"])] = list(r["cent"])
    return [
        [by_j[j][c] for c in sorted(by_j[j])] for j in sorted(by_j)
    ]


def ivf_pq_index_topk(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    pq_path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The compressed query path over the MAINTAINED index: probe
    ``nprobe`` cells from the committed IVF centroids, ADC-rank the
    probed rows against the committed PQ codebooks, and with
    ``rerank`` fetch only that short list's raw vectors for an exact
    cosine re-rank (operators/pq.ivf_pq_refined's refine stage, wired
    to the streaming tables). Returns (qid, cid, rank).

    Shape: centroids/LUT broadcast; candidates are one cell equi-join
    (probed fraction of the index); codes are computed from the probed
    rows behind the same seam a codes-at-ingest index serves — at
    corpus scale the encode moves into the maintenance stream's append
    (O(batch), like cell assignment) and this query reads the stored
    codes column instead."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        pq as PQ,
    )

    books = read_pq_codebooks(spark, pq_path)
    cents = S.read(spark, codebook_path)
    q = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    qcell = SIM._assign_cells(q, cents, nprobe).select(
        F.col("id").alias("qid"), "cell"
    )
    idx = read_index(spark, index_path)
    # every vector lives in exactly one cell → (qid, id) unique
    cand = idx.join(F.broadcast(qcell), "cell").select("qid", "id")
    probed = idx.join(
        cand.select("id").distinct(), "id", "left_semi"
    ).select(F.col("id").alias("vec_id"), F.col("v").alias("embedding"))
    codes = PQ.pq_encode(probed, books, "vec_id", "embedding")
    lut = PQ._adc_lut(spark, queries, books, id_col, vec_col)
    scored = (
        cand.join(codes, "id")
        .select("qid", "id", F.posexplode("codes").alias("j", "code"))
        .join(F.broadcast(lut), ["qid", "j", "code"])
        .groupBy("qid", "id")
        .agg(F.sum("d2_micro").alias("adc_d2"))
    )
    short = PQ._two_stage_topk(scored, rerank or k)
    if not rerank:
        return short.select("qid", "cid", "rank")
    qv = queries.select(
        F.col(id_col).alias("qid"),
        V.as_double(F.col(vec_col)).alias("qv"),
    )
    cv = idx.select(F.col("id").alias("cid"), F.col("v").alias("cv"))
    rescored = (
        short.select("qid", "cid")
        .join(qv, "qid")
        .join(cv, "cid")
        .withColumn(
            "cos", F.round(V.cosine(F.col("qv"), F.col("cv")), 5)
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "rank")
    )


def ivf_pq_index_recall(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    pq_path: str,
    probe_queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    rerank: int | None = None,
) -> float:
    """ADC recall@k of the compressed probe path against exact brute
    force over the SAME index rows (all-cells raw-cosine ranking) —
    the drift monitor for BOTH stale axes at once: wrong cells probed
    (IVF centroids) and wrong compressed ranking (PQ codebooks). Run
    on a probe sample on a monitoring cadence, like
    ``ivf_index_recall``."""
    n_cells = S.read(spark, codebook_path).count()
    approx = ivf_pq_index_topk(
        spark, index_path, codebook_path, pq_path, probe_queries,
        k=k, nprobe=nprobe, rerank=rerank,
    )
    exact = ivf_index_topk(
        spark, index_path, codebook_path, probe_queries,
        k=k, nprobe=n_cells,
    )
    total = exact.count()
    if total == 0:
        return 1.0
    hits = approx.join(
        exact.select("qid", "cid"), ["qid", "cid"], "left_semi"
    ).count()
    return hits / total


def check_and_retrain_pq(
    spark: SparkSession,
    index_path: str,
    codebook_path: str,
    pq_path: str,
    probe_queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    threshold: float = 0.8,
    stride: int = 37,
    m: int = 1,
    k_codes: int = 8,
    rerank: int | None = None,
) -> tuple[float, bool]:
    """The measured drift trigger for the COMPRESSED index: evaluate
    ADC recall@k on ``probe_queries``; below ``threshold``, retrain
    BOTH artifacts on the current index vectors — IVF recluster
    (``recluster_ivf``: centroids + full re-assign, watermark
    re-stamped, atomic) then PQ codebook retrain (atomic overwrite of
    the codebook table). Returns (observed recall, whether a retrain
    ran). A query racing the replaces sees one degraded read, never an
    invalid result — same guarantee as ``check_and_recluster``."""
    recall = ivf_pq_index_recall(
        spark, index_path, codebook_path, pq_path, probe_queries,
        k=k, nprobe=nprobe, rerank=rerank,
    )
    if recall >= threshold:
        return recall, False
    recluster_ivf(spark, index_path, codebook_path, stride)
    vectors = read_index(spark, index_path).select(
        F.col("id").alias("vec_id"), F.col("v").alias("embedding")
    )
    commit_pq_codebooks(
        spark, pq_path, vectors, m=m, k_codes=k_codes
    )
    return recall, True
