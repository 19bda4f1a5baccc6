from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    multimodal as MM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    similarity as SIM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import explain
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table


def test_cosine_topk_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    got = SIM.cosine_topk(queries, corpus, k=3, round_to=5).collect()

    qv = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
          for r in queries.collect()}
    cv = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
          for r in corpus.collect()}
    for qid in qv:
        cos = {
            cid: round(float(np.dot(qv[qid], v))
                       / (np.linalg.norm(qv[qid]) * np.linalg.norm(v)), 5)
            for cid, v in cv.items()
        }
        expected = sorted(cos, key=lambda c: (-cos[c], c))[:3]
        mine = [r["cid"] for r in sorted(
            (r for r in got if r["qid"] == qid), key=lambda r: r["rank"])]
        assert mine == expected, f"query {qid}"


def test_cosine_topk_partial_before_global_window(spark, sf_dir):
    """Scale guard: the exact top-k must bound per-task input — a partial
    (spark_partition_id, qid) window and its rank filter have to run before
    the global qid-only window, so the final window ranks at most
    |partitions| x k rows per query instead of the whole scored corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    df = SIM.cosine_topk(queries, corpus, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lower = plan.lower()
    assert "spark_partition_id" in lower, "partial window lost its pid key"
    assert "prank" in lower, "partial rank column missing from plan"
    # Physical plans print top-down: the global (qid-only) window comes
    # first, the pid-keyed partial window deeper. The partial's rank filter
    # (prank <= 3) must sit strictly below the global window node.
    global_w = lower.find("window")
    partial_filter = lower.find("prank#", global_w)
    assert partial_filter > global_w, "prank filter not upstream of global window"


def test_srp_ann_finds_planted_twins(spark, sf_dir):
    """An identical vector lands in the same SRP bucket by construction, so
    a query that is an exact copy of a corpus vector must retrieve it at
    rank 1 with cos=1.0. (Statistical recall on *random* vectors is
    meaningless — nearest neighbors of random points are near-orthogonal.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb
    queries = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    out = SIM.srp_lsh_topk(queries, corpus, k=1, n_planes=4, round_to=5).collect()
    top1 = {r["qid"] - 10000: (r["cid"], r["cos"]) for r in out if r["rank"] == 1}
    for orig in range(5):
        cid, cos = top1[orig]
        assert cid == orig and cos == 1.0


def test_ivf_ann_finds_planted_twins_and_reasonable_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb
    queries = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "embedding"
    )
    out = SIM.ivf_topk(queries, corpus, k=1, centroid_stride=7, nprobe=1).collect()
    # identical vector → identical cell assignment → must be retrieved
    top1 = {r["qid"] - 10000: (r["cid"], r["cos"]) for r in out if r["rank"] == 1}
    for orig in range(5):
        cid, cos = top1[orig]
        assert cid == orig and cos == 1.0


def test_embedding_near_dup_pairs_full_recall_on_twins(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = emb.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
    corpus = emb.unionByName(twins)
    pairs = SIM.srp_near_dup_pairs(corpus, threshold=0.99).collect()
    n_vecs = emb.count()
    # every (v, twin) pair found, nothing else at this threshold
    assert len(pairs) == n_vecs
    for r in pairs:
        assert r["id2"] == r["id1"] + 100000 and r["cos"] == 1.0


def test_cosine_topk_fast_matches_expression_version(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    corpus = emb.filter(F.col("vec_id") % 100 != 0)
    slow = SIM.cosine_topk(queries, corpus, k=5, round_to=5).collect()
    fast = SIM.cosine_topk_fast(queries, corpus, k=5, round_to=5).collect()
    s = {(r["qid"], r["rank"]): r["cid"] for r in slow}
    f = {(r["qid"], r["rank"]): r["cid"] for r in fast}
    assert s == f


def test_deterministic_sample_is_stable(spark, sf_dir):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.sampling import (
        deterministic_sample,
        train_test_split,
    )

    li = load_table(spark, sf_dir, "lineitem")
    a = sorted(
        r["l_orderkey"]
        for r in deterministic_sample(li, "l_orderkey", 0.05)
        .select("l_orderkey")
        .distinct()
        .collect()
    )
    b = sorted(
        r["l_orderkey"]
        for r in deterministic_sample(li.repartition(7), "l_orderkey", 0.05)
        .select("l_orderkey")
        .distinct()
        .collect()
    )
    assert a == b  # placement-independent
    d = load_table(spark, sf_dir, "documents")
    split = train_test_split(d, "doc_id", 0.1, 0.1)
    counts = {r["split"]: r["n"] for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    total = sum(counts.values())
    assert total == d.count()
    assert 0.03 < counts.get("test", 0) / total < 0.25  # ≈10% by hash


def test_multimodal_meta_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = MM.synthesize_media_from_documents(docs)
    meta = MM.extract_image_meta(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    import hashlib

    for mid, r in rows.items():
        payload = src[mid].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert r["format"] in ("jpeg", "png", "webp")
    # decode runs Arrow-batched, not row-at-a-time Python
    explain.assert_no_python_row_udf(meta)


def test_frame_sample_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = MM.synthesize_media_from_documents(docs)
    frames = MM.frame_sample_plan(media, every_n=10)
    rows = frames.collect()
    assert len(rows) > 0
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    # only video rows explode into frames
    video_ids = {r["media_id"] for r in media.filter("media_type = 'video'").collect()}
    assert {r["media_id"] for r in rows} <= video_ids


def test_decode_stub_raises():
    import pytest

    with pytest.raises(NotImplementedError):
        MM.decode_image_stub(b"\x89PNG")
