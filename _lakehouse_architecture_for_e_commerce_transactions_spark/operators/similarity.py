"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: broadcast the (small) query set
  against the corpus, score with JVM-side expressions, rank per query. The
  corpus is never shuffled — the only exchange is the final per-query top-k
  (k rows per query per partition after a partial window, bounded output).
* ``srp_lsh_topk`` — sign-random-projection LSH: deterministic ±1
  hyperplanes (integer-arithmetic pseudo-hash, engine-portable), bucket on
  the bit signature, score only within buckets. This is the 100 TB path:
  candidate generation is a hash-bucket equi-join instead of a cross join.

Scores are rounded before ranking (with an id tie-break) so ranking is a
pure function of the data and reproducible under any summation order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    vectors as V,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.util import (
    spread,
)


def _scored(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    round_to: int,
) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("qid"), V.as_double(F.col(vec_col)).alias("qv")
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("cid"), V.as_double(F.col(vec_col)).alias("cv")
        )
    )
    return (
        c.crossJoin(F.broadcast(q))
        .withColumn("cos", F.round(V.cosine(F.col("qv"), F.col("cv")), round_to))
        .select("qid", "cid", "cos")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, cid, cos, rank).

    Two-stage ranking so no task ever holds a full corpus of scores: stage 1
    ranks within (scan-partition, qid) — parallelism |partitions| x |queries|,
    each task bounded by one scan split — and keeps k rows; stage 2 ranks the
    surviving |partitions| x k rows per query. Any global top-k row ranks
    <= k inside its own partition under the same (cos desc, cid asc) order,
    so the result is exact. A single qid-partitioned window here would drain
    every scored row for a query into one reducer task — an OOM/straggler at
    100x corpus size. ``cosine_topk_fast`` is the same shape with BLAS-batch
    scoring and no shuffle of the scored set at all.
    """
    scored = _scored(queries, corpus, id_col, vec_col, round_to).withColumn(
        "pid", F.spark_partition_id()
    )
    pw = Window.partitionBy("pid", "qid").orderBy(
        F.col("cos").desc(), F.col("cid").asc()
    )
    partial = (
        scored.withColumn("prank", F.row_number().over(pw))
        .filter(F.col("prank") <= k)
        .drop("pid", "prank")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return partial.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 5,
) -> DataFrame:
    """Arrow-vectorized brute-force top-k: numpy matmul inside mapInPandas.

    Same result contract as ``cosine_topk`` (tested equivalent); ~an order
    of magnitude faster per row because scoring is one C BLAS call per Arrow
    batch instead of per-pair expression evaluation. The query side is
    collected to the driver (bounded, small by contract) and shipped to
    executors inside the closure; each corpus partition emits only its local
    top-k per query, so the final exact window ranks |partitions| × k rows
    per query, not the whole corpus.

    This is the 100 TB shape for exhaustive scoring: corpus never shuffles,
    network traffic is k rows per query per partition.
    """
    import numpy as np

    q_rows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = [int(r[0]) for r in q_rows]
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    Qn = np.linalg.norm(Q, axis=1)

    out_schema = "qid long, cid long, cos double"
    kk = k

    def score(it):
        import numpy as _np
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            C = _np.stack([_np.asarray(v, dtype=_np.float64) for v in pdf["v"]])
            cn = _np.linalg.norm(C, axis=1)
            sims = (C @ Q.T) / (cn[:, None] * Qn[None, :])
            cids = pdf["cid"].to_numpy()
            take = min(kk, sims.shape[0])
            frames = []
            for j, qid in enumerate(qids):
                # round BEFORE selecting, and break ties by cid, so the
                # partition-local prune uses exactly the final window's
                # (cos desc, cid asc) order — an unrounded argpartition
                # could keep a tied candidate the global rank rejects
                col = sims[:, j].round(5)
                order = _np.lexsort((cids, -col))[:take]
                frames.append(
                    _pd.DataFrame(
                        {"qid": qid, "cid": cids[order], "cos": col[order]}
                    )
                )
            yield _pd.concat(frames)

    # No repartition here: per-partition work is one BLAS matmul, so natural
    # input splits (many at real scale) are the right parallelism unit, and
    # forcing defaultParallelism partitions on a small corpus only multiplies
    # Python-worker startups.
    c = corpus.select(
        F.col(id_col).alias("cid"), V.as_double(F.col(vec_col)).alias("v")
    )
    partial = c.mapInPandas(score, out_schema)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        partial.withColumn("cos", F.round(F.col("cos"), round_to))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_signature_bit(vec: F.Column, plane: int) -> F.Column:
    """Sign bit of <vec, h_plane> where h_plane[d] = ±1 from pure-integer
    arithmetic (portable to any oracle engine, no RNG state).

    Family: parity of ``(p·7919 + d·104729 + p·d·65537) mod 1000003``.
    The BILINEAR p·d term and the large prime modulus are load-bearing
    (r13): the original family ``parity((p·1000003 + d·7919) mod 97)``
    was a rank-1 lattice — every plane a cyclic shift of ONE period-97
    ±1 sequence — so plane bits were mutually correlated and the
    effective signature entropy stopped growing with plane count. At a
    400k-vector corpus the 45-plane prefixes collapsed into clusters of
    up to 1,986 identical signatures (Σ cluster² = 181M, 7.5× the
    adaptive-split bound; the scaled near-dup leg hung at 100×). The
    full-rank family measured max cluster 2 (exactly the planted twin
    pairs) and Σ cluster² = 2N on the same corpus — numbers in
    TUNING.md round 13.

    All hash arithmetic is int64 end-to-end (r14): the literal terms
    otherwise evaluate in 32-bit IntegerType and silently wrap once
    plane·d ≥ 32768 (~45 planes × ~730 dims), diverging from the int64
    numpy twin in ``srp_near_dup_pairs_scaled`` and the BIGINT oracles
    (and throwing under ANSI mode). Identity at today's plane counts —
    pinned by tests/test_ann_edge_semantics.py at plane=600 where the
    32-bit form wraps."""
    coeff = lambda d: F.when(  # noqa: E731
        (
            (
                F.lit(plane).cast("long") * 7919
                + d.cast("long") * 104729
                + F.lit(plane).cast("long") * d * 65537
            )
            % 1000003
        )
        % 2
        == 0,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    proj = F.aggregate(
        F.transform(vec, lambda x, i: x * coeff(i)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("int")


def srp_bucket(vec: F.Column, n_planes: int = 8) -> F.Column:
    """n-bit sign-random-projection bucket id (string key)."""
    bits = [srp_signature_bit(vec, p) for p in range(n_planes)]
    return F.concat_ws("", *[b.cast("string") for b in bits])


def srp_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    round_to: int = 5,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection over a corpus: SRP-bucket
    self-join (near-identical vectors share all sign bits) then exact cosine
    on candidates. Returns (id1, id2, cos) with id1 < id2 above threshold.

    The LSH family matches the use case: at high thresholds (true near-dups)
    same-bucket probability ≈ 1, so recall stays high while the self-join
    cost drops from N² to Σ bucket²."""
    v = spread(
        df.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    ).withColumn("bucket", srp_bucket(F.col("v"), n_planes))
    a = v.select(F.col("id").alias("id1"), F.col("v").alias("v1"), "bucket")
    b = v.select(F.col("id").alias("id2"), F.col("v").alias("v2"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .withColumn("cos", F.round(V.cosine(F.col("v1"), F.col("v2")), round_to))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def scaled_plane_count(n_rows: int, margin: int = 2) -> int:
    """Plane count for a scale-safe SRP signature: ``ceil(log2 N) + margin``
    (floor 8). With b ≈ log2(N) + 2 planes, a balanced signature has ~4·N
    buckets, so expected bucket occupancy stays O(1) and the self-join's
    Σ bucket² candidate volume stays O(N) at ANY corpus size — the fix for
    the fixed-width form's N²/2^b blowup (a frozen 8-plane signature caps at
    256 buckets, so candidates grow quadratically once N ≫ 256; measured
    11.6–22.4× wall at 10× data in TUNING.md's sf1.0 probe)."""
    return max(8, math.ceil(math.log2(max(n_rows, 2))) + margin)


def _scaled_bucket_assignment(
    sigs: DataFrame,
    n_planes: int,
    bucket_cap: int,
    level_step: int,
    max_extra_levels: int,
) -> DataFrame:
    """(id, band, sig) → (id, bucket) under the shallowest-fitting-prefix
    rule: a vector's level is the smallest k whose (band, prefix_k) group
    has ≤ ``bucket_cap`` members; the deepest level is the unconditional
    fallback. Because prefix_{k+1} groups are subsets of prefix_k groups,
    group counts are non-increasing in k, so the level equals the NUMBER
    of oversized prefixes a vector sits in (levels 0..max-1).

    Plan: per-level count windows over the slim (id, band, sig)
    relation — the payload never rides them (vectors join back by id
    later). The deepest level needs no window: it is the unconditional
    fallback, so only levels 0..max-1 check their group size.

    Plan note (round 12): the r11-verdict-prescribed alternative —
    groupBy the deepest checked prefix once, roll counts up on the
    deduped relation, equi-join the level back (2 hash moves of the
    signature relation instead of 4 sorted ones) — was built and A/B
    measured: a wash at sf1.0 (5.65 vs 5.60 s) and slightly slower in
    a fresh session at sf0.1 (2.45 vs 2.05 s min-of-5), but 2× and
    ERRATIC inside a long bench session (5.5–7.7 s/rep; the level join
    re-evaluates the mapInPandas signature stage on a second path,
    and AQE's broadcast choice for the deduped side re-runs it again
    under worker churn). Four sorted shuffles of a ~70-byte-row
    relation are the cheaper, steadier plan at both measured scales;
    numbers in TUNING.md (round 12)."""
    counts = [
        F.count("*").over(
            Window.partitionBy(
                "band", F.substring("sig", 1, n_planes + level_step * k)
            )
        )
        for k in range(max_extra_levels)
    ]
    level = F.lit(max_extra_levels)
    for k in range(max_extra_levels - 1, -1, -1):
        level = F.when(counts[k] <= bucket_cap, k).otherwise(level)
    return sigs.withColumn("lvl", level).select(
        "id",
        F.concat_ws(
            ":",
            F.col("band"),
            F.col("lvl"),
            F.col("sig").substr(
                F.lit(1), F.lit(n_planes) + F.lit(level_step) * F.col("lvl")
            ),
        ).alias("bucket"),
    )


def srp_near_dup_pairs_scaled(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    bands: int = 2,
    plane_margin: int = 2,
    round_to: int = 5,
    n_rows: int | None = None,
    bucket_cap: int = 64,
    level_step: int = 6,
    max_extra_levels: int = 4,
) -> DataFrame:
    """Scale-safe embedding near-dup detection: the 100 TB form of
    ``srp_near_dup_pairs``.

    Three mechanisms close the fixed-width form's quadratic gap without
    giving up recall:

    * **Plane count grows with the corpus** (``scaled_plane_count``:
      ~log2 N + margin), so on well-spread data expected bucket occupancy
      — and the bucket self-join's Σ bucket² candidate cost — is O(N).
    * **Adaptive bucket splitting** (round 11, after the sf1.0 probe
      measured Σ bucket² at 70×/10× on CLUSTERED data, where log-growth
      alone cannot help: members of a tight sub-threshold cluster agree
      on ~all random hyperplanes): every band bucket larger than
      ``bucket_cap`` is re-split by a LONGER prefix of the same signature
      (+``level_step`` planes per level, up to ``max_extra_levels``), so
      Σ bucket² ≤ cap·N *plus the squared sizes of clusters still
      oversized at the deepest level* (a cluster of bit-identical
      signatures shares every plane sign at any prefix length, so it
      never splits; for genuinely *near*-dup clusters a pair at
      per-plane agreement a survives all splits with probability
      a^(step·levels) ≈ 0.9^24 ≈ 8% for a cos≈0.95 cluster at the
      defaults). A vector's final level is the shallowest prefix whose
      (band, prefix) group fits the cap — a pure function of the
      signature relation's group sizes, so the DuckDB oracle replays it
      exactly with the same window counts.
    * **Multiple OR-composed bands** (disjoint hyperplane index ranges)
      keep recall: a true near-dup pair is a candidate if it collides in
      ANY band at its final level. In the near-dup regime this operator
      targets (cos ≥ 0.999 ⇒ per-plane agreement ≥ 0.9996) per-band
      recall stays ≥ 0.98 even at maximum depth; boundary-threshold
      pairs (cos ≈ 0.99) degrade gracefully like any LSH. The recall pin
      vs the exact baseline lives in tests/test_similarity_multimodal.py.

    One scan computes ALL band signatures (maximum depth) in a single
    BLAS matmul per Arrow batch (``mapInPandas``; the ±1 hyperplane
    matrix is materialized once per task from the same integer hash as
    ``srp_signature_bit``). The signature relation carries only
    (id, band, sig) — the vectors are joined back BY ID after candidate
    generation, so the window counts and the bucket self-join never
    shuffle the embedding payload. Pairs found in several bands dedup
    BEFORE the exact-cosine verify. ``n_rows`` lets a caller that
    already knows the corpus size (e.g. from parquet footer metadata)
    keep plan construction action-free; otherwise one O(1)-result count
    action sizes the signature."""
    n = int(n_rows) if n_rows is not None else df.count()
    n_planes = scaled_plane_count(n, plane_margin)
    plen = n_planes + level_step * max_extra_levels
    total_planes = bands * plen
    nb = bands

    def sig_batches(it):
        import numpy as _np
        import pandas as _pd

        H = None  # (total_planes, dim) ±1 hyperplanes, built per task
        for pdf in it:
            if not len(pdf):
                continue
            M = _np.stack(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["v"]]
            )
            if H is None or H.shape[1] != M.shape[1]:
                p = _np.arange(total_planes, dtype=_np.int64)[:, None]
                d = _np.arange(M.shape[1], dtype=_np.int64)[None, :]
                # same full-rank family as srp_signature_bit — the
                # bilinear term is what keeps deep prefixes
                # discriminating (see its docstring for the r13
                # rank-1-lattice failure this replaced)
                H = _np.where(
                    ((p * 7919 + d * 104729 + p * d * 65537) % 1000003)
                    % 2
                    == 0,
                    1.0,
                    -1.0,
                )
            bits = (M @ H.T) >= 0  # (rows, total_planes)
            ids = pdf["id"].to_numpy()
            out_id, out_band, out_s = [], [], []
            for band in range(nb):
                bb = bits[:, band * plen : (band + 1) * plen]
                for r in range(len(ids)):
                    out_id.append(ids[r])
                    out_band.append(band)
                    out_s.append(
                        "".join("1" if b else "0" for b in bb[r])
                    )
            yield _pd.DataFrame(
                {"id": out_id, "band": out_band, "sig": out_s}
            )

    v = spread(
        df.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    )
    sigs = v.mapInPandas(sig_batches, "id long, band int, sig string")
    bucketed = _scaled_bucket_assignment(
        sigs, n_planes, bucket_cap, level_step, max_extra_levels
    )
    a = bucketed.select(F.col("id").alias("id1"), "bucket")
    b = bucketed.select(F.col("id").alias("id2"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .dropDuplicates(["id1", "id2"])
    )
    # verify side reads the corpus directly (no spread() repartition —
    # that exchange only balances the mapInPandas batches; here it would
    # just add a full-corpus shuffle before the join)
    raw = df.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    c1 = raw.select(F.col("id").alias("id1"), F.col("v").alias("v1"))
    c2 = raw.select(F.col("id").alias("id2"), F.col("v").alias("v2"))
    return (
        cand.join(c1, "id1")
        .join(c2, "id2")
        .withColumn("cos", F.round(V.cosine(F.col("v1"), F.col("v2")), round_to))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def srp_cross_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_planes: int = 8,
    round_to: int = 5,
) -> DataFrame:
    """Embedding-space DECONTAMINATION: which training vectors are
    near-duplicates of a held-out benchmark set? The cross-corpus twin
    of ``srp_near_dup_pairs`` — both sides SRP-bucket with the same
    deterministic hyperplanes, candidates come from the bucket
    EQUI-join (never train × bench), and exact cosine verifies.
    Returns one row per contaminated training vector:
    ``(train_id, n_bench_hits, max_cos)``.

    Scale: the benchmark side is the small one by construction (eval
    sets are thousands of rows, training sets are billions), so Spark
    broadcasts it inside each bucket join; the training corpus is
    scanned once and never shuffled beyond the bucket hash. At high
    thresholds the SRP family's same-bucket probability ≈ 1, so recall
    stays high while cost drops from |T|·|B| to Σ bucket_T·bucket_B."""
    t = spread(
        train.select(
            F.col(id_col).alias("train_id"),
            V.as_double(F.col(vec_col)).alias("tv"),
        )
    ).withColumn("bucket", srp_bucket(F.col("tv"), n_planes))
    b = bench.select(
        F.col(id_col).alias("bench_id"),
        V.as_double(F.col(vec_col)).alias("bv"),
    ).withColumn("bucket", srp_bucket(F.col("bv"), n_planes))
    return (
        t.join(F.broadcast(b), "bucket")
        .withColumn(
            "cos", F.round(V.cosine(F.col("tv"), F.col("bv")), round_to)
        )
        .filter(F.col("cos") >= threshold)
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).alias("n_bench_hits"),
            F.max("cos").alias("max_cos"),
        )
    )


def ivf_centroids(corpus: DataFrame, id_col: str, vec_col: str, stride: int) -> DataFrame:
    """Deterministic centroid pick (every stride-th vector). A production
    index trains k-means here; the cell-assignment/probe machinery below is
    identical either way, and a data-independent pick keeps the operator a
    pure function of its input (oracle-checkable)."""
    return corpus.filter(F.col(id_col) % stride == 0).select(
        F.col(id_col).alias("cent_id"), V.as_double(F.col(vec_col)).alias("cent_v")
    )


def _round6_int_micro(cos):
    """round(x, 6)·1e6 as int64: ``sign(x)·floor(|x|·1e6 + 0.5)``.

    This is bit-for-bit the DuckDB oracle's double rounding (multiply
    by 10^s, half away from zero — probed empirically incl. the
    boundary doubles 0.9999995 → 1.0 and 0.9999994999999999 →
    0.999999; pinned vs a live DuckDB in
    tests/test_ann_edge_semantics.py). Spark's own ``F.round`` takes
    the BigDecimal shortest-decimal-repr path instead and can diverge
    from BOTH in the half-ulp boundary class — the same pre-existing
    divergence class every F.round-vs-oracle column in the catalog
    carries; the parity gate compares THIS emulation to the DuckDB
    oracle, so matching the oracle exactly is the stronger contract
    (r14, ADVICE item on the round emulation). NaN propagates (callers
    mask it first)."""
    import numpy as _np

    return _np.sign(cos) * _np.floor(_np.abs(cos) * 1e6 + 0.5)


def trained_centroids(
    corpus: DataFrame,
    cents: DataFrame,
    train_iters: int,
    train_tol: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_on: DataFrame | None = None,
) -> DataFrame:
    """Refine a seed centroid set with ``train_iters`` *spherical*
    k-means passes (operators/clustering.kmeans_fit, metric-matched to
    the cosine probe) — the real IVF training step, shared by
    ``ivf_topk`` and the IVF-PQ family. ``train_iters <= 0`` returns
    the seeds untouched (the stateless oracle-default path). The seed
    collect is the usual bounded centroid-class collect. ``train_on``
    substitutes the Lloyd passes' input (e.g. a deterministic 1-in-m
    sample of the corpus) while assignment still covers every corpus
    row: each training pass costs O(|train_on|·k) expression-assignment
    work, and centroid quality needs distribution COVERAGE, not every
    row — the standard production trade (measured in TUNING r14's 100x
    probe: sampled training keeps recall at equal nprobe for a
    fraction of the training wall)."""
    if train_iters <= 0:
        return cents
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        clustering as CLU,
    )

    seeds = [(r["cent_id"], list(r["cent_v"])) for r in cents.collect()]
    trained, _ = CLU.kmeans_fit(
        corpus if train_on is None else train_on,
        seeds=seeds,
        max_iter=train_iters,
        tol=train_tol,
        id_col=id_col,
        vec_col=vec_col,
        spherical=True,  # the probe metric is cosine
    )
    return corpus.sparkSession.createDataFrame(
        [(c, v) for c, v in trained],
        "cent_id long, cent_v array<double>",
    )


def _assign_cells(
    vecs: DataFrame, cents: DataFrame, n_cells: int
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment; ``n_cells`` > 1 keeps that
    many nearest cells (query-side multi-probe).

    Executed as ONE BLAS matmul per Arrow batch against the collected
    centroid matrix (``mapInPandas``), not a crossJoin + expression
    cosine + window: the relational form evaluates N·C element-wise
    cosines in Catalyst (r13 probe: >9 min for 196k vectors × 5.1k
    stride-picked centroids — the assignment, not the probe join, was
    the whole wall), the matmul does the same arithmetic at BLAS speed
    (same corpus: seconds). The centroid collect is the same bounded
    class as the k-means/codebook collects: centroid count is the
    caller's design parameter (~√N at cluster scale ⇒ MBs).

    Semantics replicated exactly from the relational form so the SQL
    oracles keep matching: cosine in float64, rounded to 6 decimals
    with the oracle's half-away-from-zero emulation
    (``_round6_int_micro``) BEFORE ranking, ties broken by ascending
    cent_id. Division-by-zero cosines (zero-norm vector OR centroid)
    are NULL in both engine forms (Spark and DuckDB both yield NULL
    for x/0.0) and NULL sorts LAST under desc — while genuine NaN
    (NaN components in the inputs) sorts FIRST (both engines order
    NaN greatest). r14: the zero-norm case previously rode the
    NaN-first branch, which would let a degenerate zero-norm CENTROID
    capture every vector; now only real NaN ranks first (ADVICE
    medium item)."""
    from pyspark.sql.types import LongType, StructField, StructType

    cent_rows = sorted(
        ((r["cent_id"], list(r["cent_v"])) for r in cents.collect()),
        key=lambda t: t[0],
    )
    out_schema = StructType(
        [
            vecs.schema["id"],
            vecs.schema["v"],
            StructField("cell", LongType(), True),
        ]
    )
    if not cent_rows:
        return vecs.sparkSession.createDataFrame([], out_schema)
    import numpy as _np

    cent_ids = _np.array([c for c, _ in cent_rows], dtype=_np.int64)
    C = _np.stack([_np.asarray(v, dtype=_np.float64) for _, v in cent_rows])
    cn = _np.linalg.norm(C, axis=1)
    zero_cent = cn == 0.0
    any_zero_cent = bool(zero_cent.any())
    keep = min(n_cells, len(cent_rows))

    def batches(it):
        import pandas as _pd

        for pdf in it:
            if not len(pdf):
                continue
            M = _np.stack(
                [_np.asarray(x, dtype=_np.float64) for x in pdf["v"]]
            )
            vn = _np.linalg.norm(M, axis=1)
            with _np.errstate(divide="ignore", invalid="ignore"):
                cos = (M @ C.T) / (vn[:, None] * cn[None, :])
            # ONE exact int64 ranking key instead of a full per-row
            # argsort over all centroids (the argsort was the wall:
            # rows × C log C comparisons dwarf the matmul). High bits:
            # the oracle's 6-decimal rounding as an integer in
            # [-1e6, 1e6]; genuine NaN (NaN inputs) maps above +1e6
            # (both engines order NaN greatest) and a ZERO divisor —
            # NULL in both engines, NULLS LAST under desc — maps
            # below -1e6. Low 24 bits: NEGATED centroid position, so
            # ties on the rounded cosine (incl. all-NULL / all-NaN
            # rows) break by ascending cent_id. All values
            # |x| <= ~2e6·2^24 < 2^45 — exact in int64, no ties left,
            # so argmax/argpartition are exact.
            with _np.errstate(invalid="ignore"):
                cos_int = _np.where(
                    _np.isnan(cos),
                    _np.int64(2_000_000),
                    _np.nan_to_num(_round6_int_micro(cos)).astype(
                        _np.int64, copy=False
                    ),
                )
            zero_v = vn == 0.0
            if any_zero_cent or zero_v.any():
                denom_zero = zero_v[:, None] | zero_cent[None, :]
                cos_int = _np.where(
                    denom_zero, _np.int64(-2_000_000), cos_int
                )
            composite = (cos_int << 24) - _np.arange(
                C.shape[0], dtype=_np.int64
            )[None, :]
            if keep == 1:
                order = _np.argmax(composite, axis=1)[:, None]
            else:
                part = _np.argpartition(-composite, keep - 1, axis=1)[
                    :, :keep
                ]
                vals = _np.take_along_axis(composite, part, axis=1)
                order = _np.take_along_axis(
                    part, _np.argsort(-vals, axis=1), axis=1
                )
            yield _pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy().repeat(keep),
                    "v": pdf["v"].to_numpy().repeat(keep),
                    "cell": cent_ids[order].reshape(-1),
                }
            )

    return vecs.select("id", "v").mapInPandas(batches, out_schema)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 37,
    nprobe: int = 2,
    round_to: int = 5,
    train_iters: int = 0,
    train_tol: float = 1e-4,
    train_on: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their nearest-centroid cell;
    each query probes its ``nprobe`` nearest cells and ranks only those
    vectors. One broadcast (centroids) + one equi-join on cell id — the
    inverted-file structure as a relational plan.

    Size ``centroid_stride`` to the corpus: a FIXED stride makes the
    centroid count N/stride, so the assignment matmul is N²/stride —
    quadratic (r13 100× probe: the stride-37 assignment of 196k
    vectors against its 5.3k centroids was the entire leg wall; the
    catalog leg pins 37 for the oracle at test scales). At cluster
    scale either pass stride ≈ √N (assignment N^1.5) or train a FIXED
    number of cells (assignment O(N·k), the production-IVF shape —
    this operator does that via ``train_iters`` with a bounded seed
    set, or by passing pre-trained seeds). Measured at the 196k/100x
    probe (TUNING r14): √N stride 6.1 s vs 95 s stride-37, recall
    equal-or-better; trained k=256 serves in seconds once trained
    (train on a sample via ``train_on`` — full-corpus Lloyd passes
    cost ~2x the stride-37 leg, a 10% sample ~2.5x less at equal
    recall).

    ``train_iters > 0`` refines the stride-picked seeds with that many
    *spherical* k-means passes (operators/clustering.kmeans_fit,
    metric-matched to the cosine probe) — the real IVF training step.
    On corpora with genuine cluster structure this buys recall at equal
    nprobe; on noise-like vectors (e.g. the synthetic testdata) no
    partitioning helps and training is a wash — measure on your data.
    The default 0 keeps the operator a pure stateless function of its
    input (the oracle-checked configuration). ``train_tol`` is the
    Lloyd early-stop tolerance passed through to ``kmeans_fit``; the
    trained catalog twin pins it to 0.0 so the pass count is exactly
    ``train_iters`` and a SQL oracle can unroll the same fixed number
    of iterations."""
    cents = ivf_centroids(corpus, id_col, vec_col, centroid_stride)
    cents = trained_centroids(
        corpus, cents, train_iters, train_tol, id_col, vec_col,
        train_on=train_on,
    )
    c = spread(
        corpus.select(F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v"))
    )
    q = queries.select(
        F.col(id_col).alias("id"), V.as_double(F.col(vec_col)).alias("v")
    )
    c_cells = _assign_cells(c, cents, 1).withColumnRenamed("id", "cid").withColumnRenamed(
        "v", "cv"
    )
    q_cells = _assign_cells(q, cents, nprobe).withColumnRenamed("id", "qid").withColumnRenamed(
        "v", "qv"
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        c_cells.join(F.broadcast(q_cells), "cell")
        .withColumn("cos", F.round(V.cosine(F.col("qv"), F.col("cv")), round_to))
        .select("qid", "cid", "cos")
        .distinct()  # a candidate can appear via several probed cells
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    round_to: int = 5,
) -> DataFrame:
    """Approximate top-k: score only pairs whose SRP buckets match.

    Recall is tunable via n_planes (fewer planes → bigger buckets → higher
    recall & cost). Multi-probe (hamming-1 neighbors) is a natural extension.
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        V.as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("bucket", srp_bucket(F.col("qv"), n_planes))
    c = spread(
        corpus.select(
            F.col(id_col).alias("cid"),
            V.as_double(F.col(vec_col)).alias("cv"),
        )
    ).withColumn("bucket", srp_bucket(F.col("cv"), n_planes))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        c.join(F.broadcast(q), "bucket")
        .withColumn("cos", F.round(V.cosine(F.col("qv"), F.col("cv")), round_to))
        .select("qid", "cid", "cos")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
