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


def _sub_d2(s, cb_j):
    """Squared-L2 distances (rows, k) between ``s`` (rows, sub_d) and one
    subspace codebook ``cb_j`` (k, sub_d), accumulated component-by-
    component IN INDEX ORDER: each ``d2 += diff²`` step reproduces the
    left-fold float association of the expression form's
    ``aggregate(zip_with(...))`` and the DuckDB oracle's
    ``list_reduce`` bit-for-bit. numpy's ``.sum(axis=-1)`` pairwise
    (8-way-unrolled) summation associates differently and can land a
    near-ulp distance on the other side of an argmin tie between two
    DISTINCT codewords (r14, ADVICE item; the association pin is
    tests/test_ann_edge_semantics.py)."""
    import numpy as _np

    d2 = _np.zeros((len(s), len(cb_j)), dtype=_np.float64)
    for t in range(s.shape[1]):
        diff = s[:, t, None] - cb_j[None, :, t]
        d2 += diff * diff
    return d2


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
    (squared-L2 argmin, ties to the lower code).

    Encoded as one numpy pass per Arrow batch against the (m, k, sub_d)
    codebook tensor — N·m·k distance evaluations are the per-row cost,
    and the Catalyst-expression form this replaced (per-codeword
    ``aggregate(zip_with(...))`` over a literal array) evaluated them
    on the interpreted expression path: the r13 100x probe measured
    pq_adc_topk at 397 s with encode as the dominant stage, the same
    slow-path class as the IVF crossJoin assignment. Distances stay
    float64 and accumulate with an EXPLICIT sequential fold over the
    sub-dimensions in index order (r14, ADVICE item): ``d2 += diff²``
    per component reproduces the left-fold association of the
    expression form's ``aggregate(zip_with(...))`` and the DuckDB
    oracle's ``list_reduce`` bit-for-bit, where numpy's
    ``.sum(axis=2)`` pairwise (8-way-unrolled) summation could land a
    near-ulp distance on the other side of an argmin tie between two
    DISTINCT codewords. ``argmin`` keeps the first (= lowest) code on
    exact ties, matching the struct-min tie-break. No join, no
    shuffle — a pure batch projection, as before."""
    import numpy as _np

    m = len(codebooks)
    sub_d = len(codebooks[0][0])
    CB = _np.asarray(codebooks, dtype=_np.float64)  # (m, k, sub_d)

    def batches(it):
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            M = _np.stack(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["v"]]
            )
            codes = _np.empty((len(M), m), dtype=_np.int32)
            for j in range(m):
                sub = M[:, j * sub_d : (j + 1) * sub_d]
                # chunk rows so the (rows, k, sub_d) diff tensor stays
                # tens of MB regardless of Arrow batch size
                for lo in range(0, len(sub), 2048):
                    s = sub[lo : lo + 2048]
                    codes[lo : lo + 2048, j] = _sub_d2(
                        s, CB[j]
                    ).argmin(axis=1)
            yield _pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "codes": list(codes)}
            )

    return corpus.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    ).mapInPandas(batches, "id long, codes array<int>")


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


def _collect_lut(lut: DataFrame, codebooks):
    """Collect the relational ADC LUT into (qids, LUT[q, j, code] int64).

    The quantization to BIGINT micro-units happens in the RELATIONAL
    build (`_adc_lut`) and is collected as-is, so the numpy scorer's
    distances are bit-identical to the SQL oracle's by construction —
    integer gathers and integer sums have no order sensitivity. The
    collect is q·m·k_codes rows — the same bounded, broadcast-sized
    relation the join form shipped to every executor anyway."""
    import numpy as _np

    m = len(codebooks)
    k_codes = max(len(b) for b in codebooks)
    rows = lut.collect()
    qids = sorted({r["qid"] for r in rows})
    qidx = {q: i for i, q in enumerate(qids)}
    T = _np.zeros((len(qids), m, k_codes), dtype=_np.int64)
    for r in rows:
        T[qidx[r["qid"]], r["j"], r["code"]] = r["d2_micro"]
    return qids, qidx, T


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
    train_iters: int = 0,
    train_tol: float = 1e-4,
    train_on: DataFrame | None = None,
) -> DataFrame:
    """IVF-ADC: the billion-scale ANN layout (Jégou et al. §V) as one
    relational plan — corpus vectors live in their nearest-centroid cell
    AND as PQ codes; a query probes its ``nprobe`` nearest cells and
    ADC-ranks only the codes inside them.

    Cost shape: centroids broadcast (bounded); cell assignment is a
    per-row argmax (no corpus shuffle); the candidate set is one cell
    equi-join (probed fraction of the corpus, not all of it); ADC
    scoring touches codes only — raw vectors never leave their scan.
    ``train_iters > 0`` refines the stride seeds with spherical Lloyd
    passes (similarity.trained_centroids) — at scale pair it with a
    stride sized for a FIXED cell count so assignment is O(N·k).
    Returns (qid, cid, adc_d2, rank)."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.similarity import (
        _assign_cells,
        ivf_centroids,
        trained_centroids,
    )

    c = spread(corpus).select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    cents = ivf_centroids(corpus, id_col, vec_col, centroid_stride)
    cents = trained_centroids(
        corpus, cents, train_iters, train_tol, id_col, vec_col,
        train_on=train_on,
    )
    ccell = _assign_cells(c, cents, 1).select("id", "cell")
    qcell = _assign_cells(q, cents, nprobe).select(
        F.col("id").alias("qid"), "cell"
    )
    cand = qcell.join(ccell, "cell").select("qid", "id").distinct()
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    lut = _adc_lut(spark, queries, codebooks, id_col, vec_col)
    # Score the candidate pairs with a per-row LUT gather instead of
    # exploding codes to (qid, id, j, code) and equi-joining the
    # broadcast LUT: the join form materializes cand·m rows against a
    # q·m·k_codes broadcast (hundreds of MB at large q) before the
    # per-pair sum; the gather reads the same BIGINT entries directly
    # (order-independent integer sum = bit-identical result).
    qids, qidx, T = _collect_lut(lut, codebooks)
    m = len(codebooks)
    import numpy as _np

    def score_pairs(it):
        import pandas as _pd

        jj = _np.arange(m)
        for pdf in it:
            if not len(pdf):
                continue
            qi = _np.array([qidx[x] for x in pdf["qid"]])
            cm = _np.stack(
                [_np.asarray(c, dtype=_np.int64) for c in pdf["codes"]]
            )
            d2 = T[qi[:, None], jj[None, :], cm].sum(axis=1)
            yield _pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy(),
                    "id": pdf["id"].to_numpy(),
                    "adc_d2": d2,
                }
            )

    pairs = cand.join(codes, "id").select("qid", "id", "codes")
    scored = pairs.mapInPandas(
        score_pairs, "qid long, id long, adc_d2 long"
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
    entry to BIGINT micro-units — then COLLECT it and score each codes
    batch with numpy gathers. The previous form exploded the corpus
    codes to (id, j, code) and equi-joined the LUT on (j, code), which
    fans out to N·m·q rows before the per-pair aggregation — the r13
    100x probe measured 6.3 BILLION join rows and a 300-400 s leg.
    Integer gathers sum the exact same BIGINT entries
    (order-independent), so results are bit-identical; each batch
    emits only its local top-k rows per query (same exactness argument
    as cosine_topk's two-stage prune: a global top-k row is top-k
    within its own batch under the same (adc_d2 asc, id asc) order),
    and the final window ranks |batches|·k rows per query."""
    import numpy as _np

    lut = _adc_lut(spark, queries, codebooks, id_col, vec_col)
    qids, qidx, T = _collect_lut(lut, codebooks)
    m = len(codebooks)
    nq = len(qids)
    if nq == 0:
        # the join form returned empty for an empty query set; the
        # gather form must short-circuit BEFORE mapInPandas — with
        # nq == 0 every non-empty corpus batch would reach
        # pd.concat([]) and raise in the executor (r14, ADVICE item)
        return spark.createDataFrame(
            [], "qid long, cid long, adc_d2 long, rank int"
        )
    qid_arr = _np.array(qids, dtype=_np.int64)
    kk = k

    def score_full(it):
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            cm = _np.stack(
                [_np.asarray(c, dtype=_np.int64) for c in pdf["codes"]]
            )
            n = len(ids)
            take = min(kk, n)
            # D[q, i] = Σ_j T[q, j, cm[i, j]] — built per subspace to
            # keep temporaries (nq, n) int64, never (nq, n, m)
            D = _np.zeros((nq, n), dtype=_np.int64)
            for j in range(m):
                D += T[:, j, :][:, cm[:, j]]
            # exact per-query prune: value-partition for the kth
            # distance, then (adc_d2, id) lexsort over the <= kth
            # slice so boundary TIES keep the id-ascending winners
            kth = _np.partition(D, take - 1, axis=1)[:, take - 1]
            frames = []
            for qi in range(nq):
                sel = _np.flatnonzero(D[qi] <= kth[qi])
                row = D[qi, sel]
                order = sel[_np.lexsort((ids[sel], row))][:take]
                frames.append(
                    _pd.DataFrame(
                        {
                            "qid": qid_arr[qi],
                            "id": ids[order],
                            "adc_d2": D[qi, order],
                        }
                    )
                )
            yield _pd.concat(frames)

    scored = (
        spread(corpus_codes)
        .select("id", "codes")
        .mapInPandas(score_full, "qid long, id long, adc_d2 long")
    )
    w = Window.partitionBy("qid").orderBy("adc_d2", "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", F.col("id").alias("cid"), "adc_d2", "rank")
    )


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
    train_iters: int = 0,
    train_tol: float = 1e-4,
    train_on: DataFrame | None = None,
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
        train_iters=train_iters, train_tol=train_tol, train_on=train_on,
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
