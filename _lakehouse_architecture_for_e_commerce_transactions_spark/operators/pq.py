"""Product quantization (PQ) for billion-scale similarity search.

The missing piece between brute-force scoring (similarity.cosine_topk*)
and cell-pruned probing (similarity.ivf_topk): compress each embedding to
``m`` one-byte codes (one per subspace) so the scan side of ANN shrinks
~d·8/m× in memory/IO (64-dim float64 → 8 codes = 64×), and score queries
against codes with an ADC lookup table instead of touching raw vectors —
the IVF-ADC layout of Jégou et al., *Product Quantization for Nearest
Neighbor Search* (TPAMI 2011), as relational plans.

Spark-first shape:

* **Codebooks are bounded driver state** (m·k_codes·(d/m) floats — KBs),
  the repo's literal-centroid pattern (TUNING.md k-means row): encoding
  is a pure projection, zero shuffles, fully codegen'd.
* **Encoding** picks each subspace's nearest centroid with an expression
  argmin over the k_codes candidates — deterministic (ties break on code
  index), so the whole operator is a pure function of (corpus, codebooks)
  and oracle-checkable.
* **ADC scoring** builds the query→code distance LUT as a *relational*
  broadcast join (q·m·k_codes rows, tiny) against the exploded code
  columns, then per-(query, vector) sums — quantized to BIGINT
  micro-units first, so the aggregate is summation-order-proof. Top-k
  uses the same two-stage partial ranking as cosine_topk: no task ever
  holds a full corpus of scores.

Deterministic ``pq_codebooks_head`` (first-k_codes subvectors) keeps the
catalog query a pure function; ``pq_codebooks_kmeans`` is the trained
path (per-subspace k-means via clustering.kmeans_fit), pytest-covered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    vectors as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.util import (
    spread,
)

Codebooks = "list[list[list[float]]]"  # [subspace][code][component]


def _subvec(vec, j: int, sub_d: int):
    """Slice subspace j (0-based) out of a full vector column."""
    return F.slice(vec, j * sub_d + 1, sub_d)


def pq_codebooks_head(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
) -> list[list[list[float]]]:
    """Deterministic codebooks: subspace j's codes are the j-th subvectors
    of the ``k_codes`` lowest-id corpus vectors. A data-independent pick —
    same role as similarity.ivf_centroids' stride pick: keeps the operator
    a pure (oracle-checkable) function; swap in ``pq_codebooks_kmeans``
    for trained quality."""
    rows = (
        corpus.select(
            F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
        )
        .orderBy("id")
        .limit(k_codes)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus")
    d = len(rows[0]["v"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    return [
        [list(r["v"][j * sub_d : (j + 1) * sub_d]) for r in rows]
        for j in range(m)
    ]


def pq_codebooks_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_codes: int = 16,
    iters: int = 3,
) -> list[list[list[float]]]:
    """Trained codebooks: independent k-means per subspace (the real PQ
    training step). Each subspace trains on its own sliced view via
    clustering.kmeans_fit; driver state stays m·k_codes·sub_d floats."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.clustering import (
        kmeans_fit,
    )

    v = corpus.select(
        F.col(id_col).alias("vec_id"), V.as_double(F.col(vec_col)).alias("v")
    )
    d = len(v.select("v").first()["v"])
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub_d = d // m
    books = []
    for j in range(m):
        sub = v.select(
            "vec_id", _subvec(F.col("v"), j, sub_d).alias("embedding")
        )
        cents, _ = kmeans_fit(sub, k=k_codes, max_iter=iters)
        books.append([list(c) for _, c in sorted(cents)])
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each subspace's nearest-centroid index
    (squared-L2 argmin, ties to the lower code). Pure projection — literal
    centroids, no join, no shuffle; whole-stage-codegen all the way."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
        text as T,
    )

    m = len(codebooks)
    sub_d = len(codebooks[0][0])

    def sq_l2(sub, cent: list[float]):
        return F.aggregate(
            F.zip_with(
                sub,
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def codes_for(v):
        def code_for(j: int):
            def with_sub(sub):
                # struct min over (d2, code) — deterministic tie-break.
                # sub is a let-bound lambda var: the slice evaluates once
                # per subspace, not once per (code, component) — naive
                # inlining blows janino past the JVM heap (64× subtree
                # duplication, see spark-perf let() note)
                cands = F.array(
                    *[
                        F.struct(
                            sq_l2(sub, c).alias("d2"),
                            F.lit(ci).alias("code"),
                        )
                        for ci, c in enumerate(codebooks[j])
                    ]
                )
                return F.array_min(cands)["code"]

            return T.let(_subvec(v, j, sub_d), with_sub)

        return F.array(*[code_for(j) for j in range(m)])

    return corpus.select(
        F.col(id_col).alias("id"),
        T.let(V.as_double(F.col(vec_col)), codes_for).alias("codes"),
    )


def _adc_lut(
    spark: SparkSession,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(qid, j, code, d2_micro): each query's subspace→code distance
    table — q·m·k_codes rows, broadcast-sized by construction."""
    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    cb_rows = [
        (j, ci, [float(x) for x in c])
        for j in range(m)
        for ci, c in enumerate(codebooks[j])
    ]
    cb = spark.createDataFrame(
        cb_rows, "j int, code int, cent array<double>"
    )
    q = queries.select(
        F.col(id_col).alias("qid"), V.as_double(F.col(vec_col)).alias("qv")
    ).select(
        "qid",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _subvec(F.col("qv"), j, sub_d).alias("sub"),
                    )
                    for j in range(m)
                ]
            )
        ).alias("s"),
    ).select("qid", "s.j", "s.sub")
    d2 = F.aggregate(
        F.zip_with("sub", "cent", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return q.join(cb, "j").select(
        "qid",
        "j",
        "code",
        F.round(d2 * 1e6, 0).cast("long").alias("d2_micro"),
    )


def _two_stage_topk(scored: DataFrame, k: int) -> DataFrame:
    """Partial top-k per (scan partition, query) then a global rank over
    |partitions|·k rows — no task ever holds a full score vector."""
    pw = Window.partitionBy("pid", "qid").orderBy("adc_d2", "id")
    partial = (
        scored.withColumn("pid", F.spark_partition_id())
        .withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= k)
        .drop("pid", "prank")
    )
    w = Window.partitionBy("qid").orderBy("adc_d2", "id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("id").alias("cid"), "adc_d2", "rank")
    )


def ivf_pq_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 37,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-ADC: the billion-scale ANN layout (Jégou et al. §V) as one
    relational plan — corpus vectors live in their nearest-centroid cell
    AND as PQ codes; a query probes its ``nprobe`` nearest cells and
    ADC-ranks only the codes inside them.

    Cost shape: centroids broadcast (bounded); cell assignment is a
    per-row argmax (no corpus shuffle); the candidate set is one cell
    equi-join (probed fraction of the corpus, not all of it); ADC
    scoring touches codes only — raw vectors never leave their scan.
    Returns (qid, cid, adc_d2, rank)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.similarity import (
        _assign_cells,
        ivf_centroids,
    )

    c = spread(corpus).select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    cents = ivf_centroids(corpus, id_col, vec_col, centroid_stride)
    ccell = _assign_cells(c, cents, 1).select("id", "cell")
    qcell = _assign_cells(q, cents, nprobe).select(
        F.col("id").alias("qid"), "cell"
    )
    cand = qcell.join(ccell, "cell").select("qid", "id").distinct()
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    lut = _adc_lut(spark, queries, codebooks, id_col, vec_col)
    exploded = cand.join(codes, "id").select(
        "qid", "id", F.posexplode("codes").alias("j", "code")
    )
    scored = (
        exploded.join(F.broadcast(lut), ["qid", "j", "code"])
        .groupBy("qid", "id")
        .agg(F.sum("d2_micro").alias("adc_d2"))
    )
    return _two_stage_topk(scored, k)


def pq_adc_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: rank PQ codes against each query's
    subspace→code distance lookup table. Returns (qid, cid, adc_d2, rank)
    — ``adc_d2`` in micro-units (BIGINT), ascending = nearer.

    The LUT is a relational build: explode queries to (qid, j, subvec),
    cross the literal codebook frame (m·k_codes rows), quantize each
    entry to BIGINT micro-units. Corpus codes explode to (id, j, code)
    and equi-join the broadcast LUT on (j, code); the per-(qid, id) sum
    of m BIGINTs is then summation-order-proof. Top-k reuses the
    two-stage partial ranking (see cosine_topk): stage 1 keeps k rows
    per (scan-partition, query), stage 2 ranks |partitions|·k rows."""
    lut = _adc_lut(spark, queries, codebooks, id_col, vec_col)
    codes = spread(corpus_codes).select(
        F.col("id"),
        F.posexplode("codes").alias("j", "code"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["j", "code"])
        .groupBy("qid", "id")
        .agg(F.sum("d2_micro").alias("adc_d2"))
    )
    return _two_stage_topk(scored, k)


def ivf_pq_refined(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int = 20,
    centroid_stride: int = 37,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-ADC with an exact-rerank REFINE stage (Jégou et al. §V.D —
    the standard billion-scale quality knob): the compressed index
    selects ``rerank`` candidates per query by ADC distance, then ONLY
    those candidates' raw vectors are fetched and exactly cosine-ranked
    to produce the final top-``k``. Closes most of the PQ quantization
    error at the cost of ``rerank`` full-width vector reads per query —
    at 100 TB the refine join touches k'·|queries| rows of the corpus
    by id equi-join (a point-lookup pattern the Bloom/stats skipping
    layer serves), never a scan. Returns (qid, cid, cos, rank)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
        vectors as V,
    )

    cand = ivf_pq_topk(
        spark, queries, corpus, codebooks, id_col, vec_col,
        k=rerank, centroid_stride=centroid_stride, nprobe=nprobe,
    ).select("qid", "cid")
    q = queries.select(
        F.col(id_col).alias("qid"), V.as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), V.as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        cand.join(q, "qid")
        .join(c, "cid")
        .withColumn(
            "cos", F.round(V.cosine(F.col("qv"), F.col("cv")), 6)
        )
        .select("qid", "cid", "cos")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cos").desc(), F.col("cid")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )
