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


def test_scaled_plane_count_tracks_corpus_size():
    """b = ceil(log2 N) + 2 (floor 8): bucket space ~4N at every scale, so
    Σ bucket² candidate volume stays O(N) instead of N²/2^b."""
    assert SIM.scaled_plane_count(100) == 9
    assert SIM.scaled_plane_count(1000) == 12
    assert SIM.scaled_plane_count(1_000_000) == 22
    assert SIM.scaled_plane_count(10**9) == 32
    assert SIM.scaled_plane_count(2) == 8  # floor
    # margin knob widens the signature (recall/occupancy trade)
    assert SIM.scaled_plane_count(1000, margin=4) == 14


def test_scaled_near_dup_recall_vs_exact_baseline(spark, sf_dir):
    """Recall of the scale-safe form (log2-N planes, two OR-composed bands)
    against the EXACT all-pairs cosine baseline, on planted NOISY near-twins
    (seeded gaussian perturbation, cos ≈ 0.9998 — pairs a narrow signature
    can genuinely miss, unlike bit-identical copies which collide in every
    band by construction). Pins the round-10 scale-safe query's recall."""
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [int(r["vec_id"]) for r in rows]
    V0 = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(7)
    scale = np.linalg.norm(V0, axis=1, keepdims=True) / np.sqrt(V0.shape[1])
    V1 = V0 + rng.normal(0.0, 0.02, V0.shape) * scale
    all_ids = ids + [i + 100000 for i in ids]
    allv = np.vstack([V0, V1])
    normed = allv / np.linalg.norm(allv, axis=1, keepdims=True)
    sims = normed @ normed.T
    n = len(all_ids)
    exact = {
        (all_ids[i], all_ids[j]) if all_ids[i] < all_ids[j] else (all_ids[j], all_ids[i])
        for i in range(n)
        for j in range(i + 1, n)
        if sims[i, j] >= 0.99
    }
    assert len(exact) >= len(ids)  # at least every planted pair
    corpus = spark.createDataFrame(
        [(i, v.tolist()) for i, v in zip(all_ids, allv)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["id1"], r["id2"])
        for r in SIM.srp_near_dup_pairs_scaled(
            corpus, threshold=0.99, bands=2, plane_margin=2
        ).collect()
    }
    assert not got - exact  # precision 1.0: every pair is exact-verified
    recall = len(got & exact) / len(exact)
    assert recall >= 0.97, f"recall {recall:.4f} over {len(exact)} true pairs"


def test_scaled_bucket_split_bounds_candidate_volume(spark):
    """The adaptive-split guarantee itself (not just recall): on a
    CLUSTERED signature relation, every over-cap (band, prefix) bucket is
    re-split by longer prefixes until it fits, so Σ bucket² — the bucket
    self-join's candidate volume — stays ≤ cap·N, *plus* the squared
    sizes of clusters still bucket-identical at the deepest level (the
    documented residue). Exercises ``_scaled_bucket_assignment``
    directly with hand-built signatures so the expected levels are
    knowable: a regression in level selection that preserved recall but
    reverted the quadratic blowup would fail here."""
    n_planes, step, levels, cap = 8, 6, 4, 64
    siglen = n_planes + step * levels  # 32
    rows = []
    # (a) spread rows: unique level-0 prefixes -> level 0 (1..200,
    # avoiding 00000000 and 11111111 which the clusters below own)
    for i in range(200):
        p0 = format(i + 1, "08b")
        rows.append((1000 + i, 0, p0 + "0" * (siglen - n_planes)))
    # (b) splittable cluster: 1024 rows share the level-0 prefix but
    # diverge in the next 6 chars (64 subgroups of 16 <= cap) -> level 1
    for i in range(1024):
        tail = format(i // 16, "06b") + format(i % 16, "018b")
        rows.append((10000 + i, 0, "11111111" + tail))
    # (c) bit-identical cluster: 100 rows, one signature everywhere ->
    # never splits, lands at the deepest level (the residue)
    for i in range(100):
        rows.append((20000 + i, 0, "0" * siglen))
    sigs = spark.createDataFrame(rows, "id long, band int, sig string")
    buckets = SIM._scaled_bucket_assignment(sigs, n_planes, cap, step, levels)
    got = {r["id"]: r["bucket"] for r in buckets.collect()}
    assert len(got) == len(rows)
    lvl = {i: int(b.split(":")[1]) for i, b in got.items()}
    assert all(lvl[1000 + i] == 0 for i in range(200))
    assert all(lvl[10000 + i] == 1 for i in range(1024))
    assert all(lvl[20000 + i] == levels for i in range(100))
    # Sigma bucket^2 bound: cap*N outside the residue, + residue cluster^2
    sizes = [
        r["c"]
        for r in buckets.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    ]
    n = len(rows)
    assert max(s for s in sizes if s != 100) <= cap
    assert sum(s * s for s in sizes) <= cap * n + 100 * 100
    # and the self-join candidate count (what Sigma bucket^2 prices)
    a = buckets.select(F.col("id").alias("id1"), "bucket")
    b = buckets.select(F.col("id").alias("id2"), "bucket")
    cands = a.join(b, "bucket").filter(F.col("id1") < F.col("id2")).count()
    assert cands <= (cap * n + 100 * 100) // 2


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


def test_decode_stub_raises_only_without_parseable_header():
    import pytest

    # a bare PNG magic without an IHDR is not decodable header-level
    with pytest.raises(NotImplementedError):
        MM.decode_image_stub(b"\x89PNG")
    # a complete PNG header IS decoded for real now
    png = _png_bytes(640, 480)
    assert MM.decode_image_stub(png) == {
        "format": "png", "width": 640, "height": 480,
    }


def _png_bytes(w: int, h: int) -> bytes:
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"  # CRC not validated by a header parse
    )


def _bmp_bytes(w: int, h: int) -> bytes:
    import struct

    return (
        b"BM"
        + struct.pack("<IHHI", 54, 0, 0, 54)
        + struct.pack("<Iii", 40, w, h)
        + bytes(20)
    )


def _gif_bytes(w: int, h: int) -> bytes:
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + bytes(6)


def _wav_bytes(sample_rate: int, channels: int) -> bytes:
    import struct

    # a JUNK chunk before fmt exercises the chunk walk
    return (
        b"RIFF" + struct.pack("<I", 48) + b"WAVE"
        + b"JUNK" + struct.pack("<I", 4) + bytes(4)
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    )


def _jpeg_bytes(w: int, h: int) -> bytes:
    import struct

    return (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(9)
        + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
        + struct.pack(">HH", h, w) + bytes(10)
    )


def test_parse_media_header_real_bytes():
    assert MM.parse_media_header(_png_bytes(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
    }
    assert MM.parse_media_header(_bmp_bytes(800, 600)) == {
        "format": "bmp", "width": 800, "height": 600,
    }
    # top-down BMPs store negative height
    assert MM.parse_media_header(_bmp_bytes(800, -600))["height"] == 600
    assert MM.parse_media_header(_gif_bytes(320, 200)) == {
        "format": "gif", "width": 320, "height": 200,
    }
    assert MM.parse_media_header(_wav_bytes(44100, 2)) == {
        "format": "wav", "sample_rate": 44100, "n_channels": 2,
    }
    assert MM.parse_media_header(_jpeg_bytes(1920, 1080)) == {
        "format": "jpeg", "width": 1920, "height": 1080,
    }
    assert MM.parse_media_header(b"not a media file") is None
    assert MM.parse_media_header(b"") is None


def test_extract_media_headers_partition_parallel(spark):
    """The mapInPandas header extractor parses real container bytes in
    executor batches; unparseable payloads yield nulls, not failures."""
    rows = [
        (1, _png_bytes(64, 32), "image"),
        (2, _wav_bytes(16000, 1), "audio"),
        (3, _jpeg_bytes(640, 480), "image"),
        (4, b"corrupt garbage", "image"),
        (5, _bmp_bytes(10, 20), "image"),
        (6, _gif_bytes(5, 7), "image"),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA).repartition(3)
    got = {r["media_id"]: r.asDict() for r in
           MM.extract_media_headers(media).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (64, 32)
    assert got[2]["format"] == "wav" and got[2]["sample_rate"] == 16000
    assert got[2]["n_channels"] == 1 and got[2]["width"] is None
    assert got[3]["format"] == "jpeg" and got[3]["width"] == 640
    assert got[4]["format"] is None and got[4]["n_bytes"] == 15
    assert got[5]["format"] == "bmp" and got[5]["height"] == 20
    assert got[6]["format"] == "gif" and (got[6]["width"], got[6]["height"]) == (5, 7)


def test_bmp_full_pixel_decode_real_bytes():
    """Hand-built 3x2 uncompressed 24-bit BMP with distinct BGR pixels:
    the decoder must handle stride padding (3*3=9 → stride 12),
    bottom-up row order, and BGR→RGB swizzle exactly."""
    import struct

    import numpy as np

    w, h = 3, 2
    # logical image (top-down, RGB): row0 = R,G,B ; row1 = white,black,gray
    logical = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    # stored: bottom-up rows, BGR, padded to 12 bytes
    body = b""
    for row in reversed(logical):
        for (r, g, b) in row:
            body += bytes([b, g, r])
        body += b"\x00" * (12 - w * 3)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    px = MM.decode_bmp_pixels(hdr + dib + body)
    assert px.shape == (2, 3, 3)
    assert px.tolist() == [[list(p) for p in row] for row in logical]

    # top-down variant (negative height) stores rows in logical order
    body_td = b""
    for row in logical:
        for (r, g, b) in row:
            body_td += bytes([b, g, r])
        body_td += b"\x00" * (12 - w * 3)
    dib_td = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0,
                         len(body_td), 2835, 2835, 0, 0)
    px_td = MM.decode_bmp_pixels(hdr + dib_td + body_td)
    assert np.array_equal(px, px_td)

    # 8-bit PALETTED BMP decodes for real: BGRA color table after the
    # DIB, 4-byte row stride on the index bytes, bottom-up order
    import pytest

    pal = [(10 * j, 5 * j, 3 * j) for j in range(16)]  # RGB
    table = b"".join(bytes([b2, g2, r2, 0]) for (r2, g2, b2) in pal)
    idx_rows = [[0, 5, 15], [7, 1, 2]]  # logical top-down
    body8 = b""
    for row in reversed(idx_rows):
        body8 += bytes(row) + b"\x00" * (4 - w)  # stride 4 at w=3
    off8 = 54 + len(table)
    hdr8 = b"BM" + struct.pack("<IHHI", off8 + len(body8), 0, 0, off8)
    dib8 = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0,
                       len(body8), 2835, 2835, 16, 16)
    px8 = MM.decode_bmp_pixels(hdr8 + dib8 + table + body8)
    assert px8.tolist() == [
        [list(pal[i]) for i in row] for row in idx_rows
    ]

    # an index beyond the declared color table is poison, not garbage
    bad = bytearray(hdr8 + dib8 + table + body8)
    bad[off8] = 16  # first stored index: outside the 16-entry table
    with pytest.raises(ValueError):
        MM.decode_bmp_pixels(bytes(bad))

    # 4-bit PALETTED BMP: two indices per byte, HIGH nibble first,
    # rows pad to 4 bytes (w=3 -> 2 data bytes + 2 pad)
    idx4 = [[0, 5, 15], [7, 1, 2]]
    body4 = b""
    for row in reversed(idx4):
        body4 += bytes(
            [(row[0] << 4) | row[1], row[2] << 4]
        ) + b"\x00\x00"
    off4 = 54 + len(table)
    hdr4 = b"BM" + struct.pack("<IHHI", off4 + len(body4), 0, 0, off4)
    dib4 = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, 0,
                       len(body4), 2835, 2835, 16, 16)
    px4 = MM.decode_bmp_pixels(hdr4 + dib4 + table + body4)
    assert px4.tolist() == [
        [list(pal[i]) for i in row] for row in idx4
    ]

    # BI_RLE8/RLE4 decode for real since round 10
    # (test_bmp_rle8_and_rle4_decode); BI_BITFIELDS (comp=3) stays a
    # typed refusal
    dibc = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 3, 0,
                       2835, 2835, 0, 0)
    with pytest.raises(NotImplementedError):
        MM.decode_bmp_pixels(hdr + dibc + body)


def test_wav_full_sample_decode_real_bytes():
    """Hand-built 16-bit PCM stereo WAV: chunk walk, little-endian
    int16 signedness, and channel de-interleave must be exact."""
    import struct

    import pytest

    frames = [(-32768, 32767), (100, -100), (0, 1)]
    data = b"".join(
        struct.pack("<hh", left, right) for (left, right) in frames
    )
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    sr, s = MM.decode_wav_samples(payload)
    assert sr == 44100
    assert s.shape == (3, 2)
    assert s.tolist() == [list(f) for f in frames]

    # 32-bit IEEE-FLOAT WAV decodes for real, into the int16 sample
    # domain (v*32768 clipped): dyadic payloads k/32768 round-trip to
    # exactly k, +/-1.0 clip to the int16 rails
    fvals = [(-32768, 32767), (100, -100), (0, 1)]
    fdata = b"".join(
        struct.pack("<ff", lo / 32768.0, hi / 32768.0)
        for (lo, hi) in fvals
    ) + struct.pack("<ff", 1.0, -1.5)  # clips to 32767 / -32768
    fmt_f = struct.pack("<HHIIHH", 3, 2, 8000, 64000, 8, 32)
    fpayload = (
        b"RIFF" + struct.pack("<I", 36 + len(fdata)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt_f
        + b"data" + struct.pack("<I", len(fdata)) + fdata
    )
    srf, sf = MM.decode_wav_samples(fpayload)
    assert srf == 8000 and sf.dtype.name == "int16"
    assert sf.tolist() == [list(f) for f in fvals] + [[32767, -32768]]

    # float WAV at non-32-bit width stays behind NotImplementedError
    fmt_f16 = struct.pack("<HHIIHH", 3, 2, 44100, 176400, 4, 16)
    bad = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt_f16
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(NotImplementedError):
        MM.decode_wav_samples(bad)


def test_extract_decoded_stats_partition_parallel(spark):
    """The mapInPandas full-decode path over a mixed media frame:
    decodable containers get exact stats, entropy-coded ones get NULL
    stats with their header format (no task failure)."""
    docs = spark.createDataFrame(
        [(0, "x"), (1, "y")], "doc_id long, text string"
    )
    media = MM.synthesize_decodable_media(docs)
    rows = {r["media_id"]: r for r in
            MM.extract_decoded_stats(media).collect()}
    b = rows[0]  # BMP from doc_id 0: bytes i%256 for i in 0..191
    assert b["format"] == "bmp"
    assert b["n_units"] == 192
    assert b["content_sum"] == sum(i % 256 for i in range(192))
    assert b["content_min"] == 0 and b["content_max"] == 191
    assert b["top_row_sum"] == sum(i for i in range(144, 192))
    w = rows[1]  # WAV from doc_id 1
    want = [((13 + i * 37) % 65536) - 32768 for i in range(128)]
    assert w["format"] == "wav"
    assert w["n_units"] == 128
    assert w["content_sum"] == sum(want)
    assert w["content_min"] == min(want)
    assert w["content_max"] == max(want)
    assert w["top_row_sum"] is None

    # a PNG (entropy-coded) yields header format with NULL stats
    png = spark.createDataFrame(
        [(9, bytearray(_png_bytes(8, 8)), "image")], MM.MEDIA_SCHEMA
    )
    r = MM.extract_decoded_stats(png).collect()[0]
    assert r["format"] == "png" and r["content_sum"] is None


def test_png_full_pixel_decode_all_filter_types():
    """Hand-built 8-bit PNGs exercising every scanline filter type
    (None/Sub/Up/Average/Paeth) and RGBA: the decoder must inflate and
    unfilter to the exact pixel values."""
    import struct
    import zlib

    import numpy as np
    import pytest

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    def build(w, h, ct, raw_rows):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw_rows))
            + chunk(b"IEND", b"")
        )

    # 3x1 RGB, filter None: trivially the stored bytes
    px = MM.decode_png_pixels(
        build(3, 1, 2, b"\x00" + bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]))
    )
    assert px.tolist() == [[[10, 20, 30], [40, 50, 60], [70, 80, 90]]]

    # 2x2 grayscale with Sub then Up filters:
    # row0 Sub: raw [5, 7] -> [5, 12]; row1 Up: raw [1, 2] -> [6, 14]
    px = MM.decode_png_pixels(
        build(2, 2, 0, b"\x01\x05\x07" + b"\x02\x01\x02")
    )
    assert px.reshape(2, 2).tolist() == [[5, 12], [6, 14]]

    # 2x2 grayscale Average then Paeth:
    # row0 Avg: [10, 21] (pred 0, then 10//2=5 -> 16+5)
    px = MM.decode_png_pixels(
        build(2, 2, 0, b"\x03\x0a\x10" + b"\x04\x01\x01")
    )
    # row1 Paeth: x0 pred=b=10 -> 11; x1 p=a+b-c=11+21-10=22,
    # pa=11,pb=1,pc=12 -> pred=b=21 -> 22
    assert px.reshape(2, 2).tolist() == [[10, 21], [11, 22]]

    # RGBA roundtrip via numpy reference
    rgba = bytes(range(32))  # 2x1 pixels x 4ch x ... w=2,h=1 -> 8 bytes
    px = MM.decode_png_pixels(build(2, 1, 6, b"\x00" + rgba[:8]))
    assert px.shape == (1, 2, 4)
    assert px.flatten().tolist() == list(range(8))

    # 16-bit palette is not a legal PNG combination — typed refusal
    ihdr16p = struct.pack(">IIBBBBB", 2, 1, 16, 3, 0, 0, 0)
    bad = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16p)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        MM.decode_png_pixels(bad)


def _png_chunk(typ, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_pack_row(samples_row, depth):
    """Pack one row of per-channel samples (flat, channel-major within
    pixel) to spec scanline bytes: MSB-first sub-byte packing for
    depth<8, big-endian two-byte samples for depth 16."""
    if depth == 8:
        return bytes(int(v) & 0xFF for v in samples_row)
    if depth == 16:
        out = bytearray()
        for v in samples_row:
            out += int(v).to_bytes(2, "big")
        return bytes(out)
    per = 8 // depth
    out = bytearray()
    for i in range(0, len(samples_row), per):
        byte = 0
        for j, v in enumerate(samples_row[i : i + per]):
            byte |= (int(v) & ((1 << depth) - 1)) << (
                8 - depth * (j + 1)
            )
        out.append(byte)
    return bytes(out)


def _png_build(samples, depth, ct, palette=None, interlace=0,
               filters=None):
    """Build a real PNG from a (h, w) or (h, w, ch) sample array.
    ``filters`` maps a sequential scanline index (across passes, in
    pass order for Adam7) to a filter type; unlisted rows use 0.
    Filtering is applied per the spec so any type round-trips."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    filters = filters or {}
    bpp = max(1, ch * depth // 8)
    if interlace == 0:
        passes = [arr]
    else:
        passes = [
            arr[y0::dy, x0::dx] for x0, y0, dx, dy in _PNG_ADAM7
        ]
    raw = bytearray()
    seq = 0
    for p in passes:
        ph, pw = p.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prev = None
        for y in range(ph):
            flat = [int(v) for v in p[y].reshape(-1)]
            row = _png_pack_row(flat, depth)
            ft = filters.get(seq, 0)
            seq += 1
            if ft == 0:
                filt = row
            else:
                up = prev if prev is not None else bytes(len(row))
                filt = bytearray()
                for x in range(len(row)):
                    a = row[x - bpp] if x >= bpp else 0
                    b = up[x]
                    c = up[x - bpp] if x >= bpp else 0
                    if ft == 1:
                        pred = a
                    elif ft == 2:
                        pred = b
                    elif ft == 3:
                        pred = (a + b) // 2
                    else:
                        pp = a + b - c
                        pa, pb, pc = (
                            abs(pp - a), abs(pp - b), abs(pp - c)
                        )
                        pred = (
                            a if pa <= pb and pa <= pc
                            else (b if pb <= pc else c)
                        )
                    filt.append((row[x] - pred) & 0xFF)
            raw += bytes([ft]) + bytes(filt)
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, interlace)
    body = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _png_chunk(
            b"PLTE", b"".join(bytes(c) for c in palette)
        )
    return (
        body + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_palette_and_sub_byte_depths():
    """Palette (PLTE) lookup and 1/2/4-bit gray decode: MSB-first
    unpacking and v*255//(2^d-1) scaling must match spec rendering."""
    import numpy as np
    import pytest

    # palette-8: indices map through PLTE to RGB
    pal = [(9, 8, 7), (255, 0, 128), (1, 2, 3), (200, 100, 50)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    px = MM.decode_png_pixels(_png_build(idx, 8, 3, palette=pal))
    want = np.array([[pal[i] for i in r] for r in idx], np.uint8)
    assert np.array_equal(px, want)

    # palette-2bit: sub-byte indices through PLTE (w=5 leaves pad bits)
    idx = np.array([[0, 1, 2, 3, 1], [3, 0, 3, 0, 2]], np.uint8)
    px = MM.decode_png_pixels(_png_build(idx, 2, 3, palette=pal))
    want = np.array([[pal[i] for i in r] for r in idx], np.uint8)
    assert np.array_equal(px, want)

    # 1-bit gray: bit v scales to v*255; w=10 spans >1 byte per row
    bits = np.array(
        [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1],
         [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], np.uint8
    )
    px = MM.decode_png_pixels(_png_build(bits, 1, 0))
    assert px.shape == (2, 10, 1)
    assert np.array_equal(px.reshape(2, 10), bits * 255)

    # 2-bit gray: v*255//3 = 0,85,170,255
    g2 = np.array([[0, 1, 2, 3, 3]], np.uint8)
    px = MM.decode_png_pixels(_png_build(g2, 2, 0))
    assert px.reshape(-1).tolist() == [0, 85, 170, 255, 255]

    # 4-bit gray: v*255//15 = v*17
    g4 = np.array([[0, 5, 10, 15], [15, 10, 5, 0]], np.uint8)
    px = MM.decode_png_pixels(_png_build(g4, 4, 0))
    assert np.array_equal(px.reshape(2, 4), g4 * 17)

    # sub-byte with non-zero filters (Sub/Up on packed bytes, bpp=1)
    g4f = np.arange(32, dtype=np.uint8).reshape(4, 8) % 16
    px = MM.decode_png_pixels(
        _png_build(g4f, 4, 0, filters={1: 1, 2: 2, 3: 4})
    )
    assert np.array_equal(px.reshape(4, 8), g4f * 17)

    # palette index outside PLTE is a loud ValueError, not garbage
    bad = _png_build(np.array([[0, 9]], np.uint8), 8, 3, palette=pal)
    with pytest.raises(ValueError):
        MM.decode_png_pixels(bad)


def test_png_adam7_interlace_decode():
    """Adam7: each pass filters independently; rows/cols scatter back
    to (x0+i*dx, y0+j*dy). Covers 8x8 (all 7 passes), 5x3
    (non-multiple size with empty-pass edge cases) and the combined
    Adam7+palette+4-bit case."""
    import numpy as np

    # 8x8 RGB, deterministic content, mixed per-pass filters
    rgb = (
        np.arange(8 * 8 * 3, dtype=np.uint32) * 37 % 251
    ).astype(np.uint8).reshape(8, 8, 3)
    filts = {i: (i % 5) for i in range(64)}
    px = MM.decode_png_pixels(
        _png_build(rgb, 8, 2, interlace=1, filters=filts)
    )
    assert np.array_equal(px, rgb)

    # 5x3 gray: passes 3 and 7 partially/fully empty at this size
    g = (np.arange(15, dtype=np.uint8) * 11 % 256).reshape(3, 5)
    px = MM.decode_png_pixels(_png_build(g, 8, 0, interlace=1))
    assert np.array_equal(px.reshape(3, 5), g)

    # combined: Adam7 + palette + 4-bit sub-byte packing
    pal = [(i, 2 * i, 3 * i) for i in range(16)]
    idx = (np.arange(9 * 9, dtype=np.uint8) * 7 % 16).reshape(9, 9)
    px = MM.decode_png_pixels(
        _png_build(idx, 4, 3, palette=pal, interlace=1)
    )
    want = np.array([[pal[i] for i in r] for r in idx], np.uint8)
    assert np.array_equal(px, want)

    # 4x4 RGBA Adam7 (passes 1,2,4,6 empty of full blocks exercise
    # the pw/ph clamping)
    rgba = (
        np.arange(4 * 4 * 4, dtype=np.uint32) * 13 % 256
    ).astype(np.uint8).reshape(4, 4, 4)
    px = MM.decode_png_pixels(_png_build(rgba, 8, 6, interlace=1))
    assert np.array_equal(px, rgba)


def test_png_gif_randomized_round_trip():
    """Randomized encoder-vs-decoder property sweep over the full
    PNG variant space (depth x color-type x interlace x per-row
    filter choice x odd sizes) and interlaced/non-interlaced GIF:
    every payload must decode to exactly the samples it was built
    from. Seeds are fixed — failures reproduce."""
    import numpy as np

    rng = np.random.default_rng(2024)
    for case in range(40):
        h = int(rng.integers(1, 14))
        w = int(rng.integers(1, 14))
        interlace = int(rng.integers(0, 2))
        kind = case % 5
        n_rows_total = h * 4  # generous bound for filter map
        filters = {
            i: int(rng.integers(0, 5)) for i in range(n_rows_total)
        }
        if kind == 0:  # 8-bit RGB / RGBA
            ch = int(rng.choice([3, 4]))
            ct = 2 if ch == 3 else 6
            img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            px = MM.decode_png_pixels(
                _png_build(img, 8, ct, interlace=interlace,
                           filters=filters)
            )
            assert np.array_equal(px, img), (case, h, w, ct)
        elif kind == 1:  # 8-bit gray
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            px = MM.decode_png_pixels(
                _png_build(img, 8, 0, interlace=interlace,
                           filters=filters)
            )
            assert np.array_equal(px.reshape(h, w), img), (case,)
        elif kind == 2:  # sub-byte gray or palette
            depth = int(rng.choice([1, 2, 4]))
            top = 1 << depth
            img = rng.integers(0, top, (h, w)).astype(np.uint8)
            if rng.integers(0, 2):  # palette
                pal = [
                    tuple(int(x) for x in rng.integers(0, 256, 3))
                    for _ in range(top)
                ]
                px = MM.decode_png_pixels(
                    _png_build(img, depth, 3, palette=pal,
                               interlace=interlace, filters=filters)
                )
                want = np.array(
                    [[pal[i] for i in r] for r in img], np.uint8
                )
                assert np.array_equal(px, want), (case, depth)
            else:  # gray with bit-replication scaling
                px = MM.decode_png_pixels(
                    _png_build(img, depth, 0, interlace=interlace,
                               filters=filters)
                )
                want = (
                    img.astype(np.uint16) * 255 // (top - 1)
                ).astype(np.uint8)
                assert np.array_equal(px.reshape(h, w), want), (
                    case, depth,
                )
        elif kind == 3:  # 16-bit gray / RGB / RGBA
            ch = int(rng.choice([1, 3, 4]))
            ct = {1: 0, 3: 2, 4: 6}[ch]
            img = rng.integers(0, 65536, (h, w, ch)).astype(np.uint32)
            px = MM.decode_png_pixels(
                _png_build(img if ch > 1 else img.reshape(h, w),
                           16, ct, interlace=interlace,
                           filters=filters)
            )
            assert px.dtype == np.uint16
            assert np.array_equal(
                px.reshape(h, w, ch), img.astype(np.uint16)
            ), (case, ch)
        else:  # GIF, interlaced or not
            pal = [
                tuple(int(x) for x in rng.integers(0, 256, 3))
                for _ in range(8)
            ]
            idx = rng.integers(0, 8, h * w).astype(int).tolist()
            if interlace:
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                raster = np.array(idx).reshape(h, w)
                stream = np.concatenate(
                    [raster[y] for y in order]
                ).tolist()
            else:
                stream = idx
            payload = _gif_build(
                w, h, pal, stream, min_code=3, interlace=bool(interlace)
            )
            px = MM.decode_gif_pixels(payload)
            want = np.array(
                [[pal[i] for i in r]
                 for r in np.array(idx).reshape(h, w)],
                np.uint8,
            )
            assert np.array_equal(px, want), (case, interlace)


def test_png_16bit_depth_decode():
    """16-bit PNG: two-byte big-endian samples, same spec filters with
    bpp = 2·channels, uint16 output (no 255-scaling — 16-bit is full
    range already). Covers gray/RGB/RGBA, all filter types on
    multi-byte samples, Adam7, and values that overflow uint8."""
    import numpy as np

    # gray with values only 16 bits can hold
    g = np.array([[0, 65535, 256], [4660, 43981, 1]], np.uint32)
    px = MM.decode_png_pixels(_png_build(g, 16, 0))
    assert px.dtype == np.uint16 and px.shape == (2, 3, 1)
    assert np.array_equal(px.reshape(2, 3), g)

    # RGB with every filter type: Sub/Average/Paeth use bpp=6, and a
    # filtered byte stream splits sample halves across predictions
    rgb = (
        np.arange(5 * 4 * 3, dtype=np.uint32) * 9973 % 65536
    ).reshape(5, 4, 3)
    px = MM.decode_png_pixels(
        _png_build(rgb, 16, 2, filters={1: 1, 2: 2, 3: 3, 4: 4})
    )
    assert px.dtype == np.uint16
    assert np.array_equal(px, rgb.astype(np.uint16))

    # RGBA + Adam7 interlace at a non-multiple size
    rgba = (
        np.arange(5 * 3 * 4, dtype=np.uint32) * 31337 % 65536
    ).reshape(3, 5, 4)
    px = MM.decode_png_pixels(_png_build(rgba, 16, 6, interlace=1))
    assert np.array_equal(px, rgba.astype(np.uint16))


def test_extract_decoded_stats_16bit_png(spark):
    """A 16-bit PNG flows through the mapInPandas stats path with
    int64 sums (values beyond uint8/uint16 totals must not wrap)."""
    import numpy as np

    g = np.array([[60000, 65535], [1, 70]], np.uint32)
    payload = _png_build(g, 16, 0)
    media = spark.createDataFrame(
        [(7, bytearray(payload), "image")], MM.MEDIA_SCHEMA
    )
    r = MM.extract_decoded_stats(media).collect()[0]
    assert r["format"] == "png"
    assert r["n_units"] == 4
    assert r["content_sum"] == 60000 + 65535 + 1 + 70
    assert r["content_min"] == 1
    assert r["content_max"] == 65535
    assert r["top_row_sum"] == 60000 + 65535


def test_extract_decoded_stats_includes_real_png(spark):
    docs = spark.createDataFrame(
        [(2, "z")], "doc_id long, text string"
    )
    media = MM.synthesize_decodable_media(docs)
    r = MM.extract_decoded_stats(media).collect()[0]
    want = [(2 * 5 + i) % 256 for i in range(96)]
    assert r["format"] == "png"
    assert r["n_units"] == 96
    assert r["content_sum"] == sum(want)
    assert r["content_min"] == min(want)
    assert r["content_max"] == max(want)
    assert r["top_row_sum"] == sum(want[:24])


def _gif_encode(indices, min_code):
    """Reference GIF-LZW encoder (dict growth, variable width,
    LSB-first) used to exercise the decoder's full algorithm."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    out_bits = []

    width = min_code + 1

    def emit(code):
        nonlocal width
        for i in range(width):
            out_bits.append((code >> i) & 1)

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    prev = b""
    for idx in indices:
        cur = prev + bytes([idx])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) - 1 and width < 12:
                # decoder grows width when ITS next_code hits 2^width;
                # encoder must grow in lockstep (one code earlier)
                pass
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        prev = bytes([idx])
    emit(table[prev])
    emit(end)
    data = bytearray()
    for i in range(0, len(out_bits), 8):
        byte = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            byte |= bit << j
        data.append(byte)
    return bytes(data)


def _gif_build(w, h, palette, indices, min_code, interlace=False):
    import struct

    gct_bits = 1  # 4-entry table minimum... use size to fit palette
    while (2 << gct_bits) < len(palette):
        gct_bits += 1
    ct = b"".join(bytes(c) for c in palette)
    ct += b"\x00" * (3 * (2 << gct_bits) - len(ct))
    lzw = _gif_encode(indices, min_code)
    sub = b""
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        sub += bytes([len(blk)]) + blk
    packed = 0x80 | gct_bits
    ipacked = 0x40 if interlace else 0
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, packed, 0, 0)
        + ct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
        + bytes([ipacked, min_code])
        + sub + b"\x00" + b"\x3b"
    )


def test_gif_full_lzw_decode_real_bytes():
    import numpy as np

    palette = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 8, 9)]
    # repeating structure drives dictionary growth incl. the KwKwK case
    idx = ([0, 1, 2, 3] * 6 + [0, 0, 0, 0, 1, 1, 1, 1] + [2] * 8) * 3
    w, h = 12, len(idx) // 12
    payload = _gif_build(w, h, palette, idx, min_code=2)
    px = MM.decode_gif_pixels(payload)
    assert px.shape == (h, w, 3)
    want = np.array([palette[i] for i in idx], np.uint8).reshape(h, w, 3)
    assert np.array_equal(px, want)

    # an extension block before the image is skipped cleanly
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
    with_ext = payload[:13 + 3 * 4] + ext + payload[13 + 3 * 4:]
    assert np.array_equal(MM.decode_gif_pixels(with_ext), want)

    # interlaced GIF now decodes for real: the stream carries rows in
    # GIF89a pass order (0,8,16… / 4,12… / 2,6,10… / 1,3,5…) and the
    # decoder scatters them back to display positions
    inter = _gif_build(w, h, palette, idx, min_code=2, interlace=True)
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    want_inter = np.empty_like(want)
    want_inter[order] = want
    got = MM.decode_gif_pixels(inter)
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, want_inter)
    assert not np.array_equal(got, want)  # scatter actually reorders


def test_gif_poison_payload_yields_null_stats(spark):
    """A corrupt LZW stream (codes outside the table) must yield NULL
    stats through extract_decoded_stats, not kill the task."""
    palette = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    good = _gif_build(4, 2, palette, [0, 1, 2, 3] * 2, min_code=2)
    # truncate the LZW data mid-stream and splice garbage codes in
    corrupt = good[:-10] + b"\xff\xff\xff" + good[-7:]
    media = spark.createDataFrame(
        [(1, bytearray(corrupt), "image")], MM.MEDIA_SCHEMA
    )
    r = MM.extract_decoded_stats(media).collect()[0]
    assert r["format"] == "gif"
    assert r["content_sum"] is None  # failed decode, clean NULLs


def test_animated_gif_real_frame_sampling(spark):
    """The video-shaped path runs END TO END on an animated GIF: real
    frame count from the block walk, every-nth sampling, and a full
    LZW decode of each sampled frame to an exact pixel sum."""
    palette = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (1, 1, 1)]
    frames_idx = [[0] * 8, [1] * 8, [2] * 8]  # 4x2 frames, solid color
    import struct

    # build a 3-frame animated GIF: screen descriptor + GCT once, then
    # three image blocks reusing the global table
    one = _gif_build(4, 2, palette, frames_idx[0], min_code=2)
    # split: header+GCT = 13 + 12 bytes (4 entries... padded to 4*3)
    gct_len = 3 * 4
    head, first_img = one[: 13 + gct_len], one[13 + gct_len : -1]
    imgs = [first_img]
    for fi in frames_idx[1:]:
        f = _gif_build(4, 2, palette, fi, min_code=2)
        imgs.append(f[13 + gct_len : -1])
    anim = head + b"".join(imgs) + b"\x3b"

    assert MM.gif_frame_count(anim) == 3
    import numpy as np

    assert np.array_equal(
        MM.decode_gif_pixels(anim),  # frame 0
        np.array([palette[0]] * 8, np.uint8).reshape(2, 4, 3),
    )

    media = spark.createDataFrame(
        [(7, bytearray(anim), "video"), (8, b"not a gif", "video")],
        MM.MEDIA_SCHEMA,
    )
    got = {
        (r["media_id"], r["frame_idx"]): (r["n_frames"], r["frame_sum"])
        for r in MM.sample_gif_frames(media, every_n=2).collect()
    }
    # frames 0 and 2 sampled; sums = 8 pixels x sum(channel values)
    assert got == {
        (7, 0): (3, 8 * 10),
        (7, 2): (3, 8 * 30),
        (8, None): (None, None),  # poison-safe NULL row
    }


def test_gif_invalid_first_code_raises_valueerror_not_keyerror():
    """A spec-invalid code as the FIRST code after a clear must raise
    the same normalized ValueError as the post-prev branch — direct
    decode callers see one exception type for one class of corruption."""
    import struct

    import pytest

    palette = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    ct = b"".join(bytes(c) for c in palette)
    # min_code=2: clear=4, end=5; width=3. First emitted code = 7
    # (> end+1, not yet in the table) — the prev-is-None poison path.
    # LSB-first bits: clear(100) then 7(111) -> byte 0b00111100 = 0x3c
    lzw = bytes([0x3C])
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x80 | 1, 0, 0)
        + ct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2)
        + bytes([0, 2])
        + bytes([len(lzw)]) + lzw + b"\x00" + b"\x3b"
    )
    with pytest.raises(ValueError, match="outside table"):
        MM.decode_gif_pixels(payload)


def test_decode_byte_caps_fail_fast():
    """Declared-dimension caps are in BYTES (w*h*channels): a
    valid-header adversarial file past 16 MiB decoded must raise
    before any allocation or unfilter/LZW loop runs."""
    import struct
    import zlib

    import pytest

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    # 2048x2048 RGBA = exactly 16 MiB -> allowed dims minus one step;
    # 4096x2048 RGBA = 32 MiB -> rejected fast
    ihdr = struct.pack(">IIBBBBB", 4096, 2048, 8, 6, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="too large"):
        MM.decode_png_pixels(png)

    # GIF: 4096x4096 -> 48 MiB RGB output, rejected before LZW
    palette = [(0, 0, 0), (1, 1, 1)]
    ct = b"".join(bytes(c) for c in palette) + b"\x00" * 0
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 4096, 4096, 0x80, 0, 0)
        + ct
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 4096, 4096)
        + bytes([0, 1])
        + b"\x01\x00" + b"\x00" + b"\x3b"
    )
    with pytest.raises(ValueError, match="too large"):
        MM.decode_gif_pixels(gif)


# --- JPEG: test-side baseline encoder (custom canonical Huffman
# tables, forward DCT) used to exercise the real decoder end to end ---

def _jpeg_seg(marker, body):
    import struct

    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


_JPEG_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# AC symbol order = canonical code order at length 8
_JPEG_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_AC_CODE = {sym: i for i, sym in enumerate(_JPEG_AC_SYMS)}


class _JpegBits:
    def __init__(self):
        self.bits = []
        self.out = bytearray()

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def flush(self):
        bits = self.bits + [1] * ((-len(self.bits)) % 8)
        self.bits = []
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)


def _jpeg_encode(pixels, subsample=None, q=16, dri=0):
    """Minimal baseline encoder: (H, W) grayscale or (H, W, 3) RGB;
    subsample=(2, 2) for 4:2:0 chroma. Returns (payload, coefficient
    store {comp_index: {(by, bx): int64[8,8] quantized coeffs}})."""
    import struct

    import numpy as np

    A = np.array(
        [
            [
                (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        samps = [(1, 1)]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sy, sx = subsample or (1, 1)
        if subsample:
            # box-average then pad chroma to its own block grid
            cb = cb.reshape(h // sy, sy, w // sx, sx).mean((1, 3))
            cr = cr.reshape(h // sy, sy, w // sx, sx).mean((1, 3))
        planes = [y, cb, cr]
        samps = [(sy, sx), (1, 1), (1, 1)]
    hmax = max(s[1] for s in samps)
    vmax = max(s[0] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtab = np.full(64, q, dtype=np.int64)

    # pad each plane to its MCU-grid size (edge replicate)
    padded = []
    for plane, (vs, hs) in zip(planes, samps):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        pp = np.zeros((ph, pw))
        pp[: plane.shape[0], : plane.shape[1]] = plane
        pp[plane.shape[0] :, : plane.shape[1]] = plane[-1:]
        pp[:, plane.shape[1] :] = pp[:, plane.shape[1] - 1 : plane.shape[1]]
        padded.append(pp)

    coeffs = {ci: {} for ci in range(len(planes))}
    bw = _JpegBits()
    preds = [0] * len(planes)
    mcount = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcount and mcount % dri == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            for ci, (plane, (vs, hs)) in enumerate(zip(padded, samps)):
                for by in range(vs):
                    for bx in range(hs):
                        gy, gx = my * vs + by, mx * hs + bx
                        blk = plane[
                            gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8
                        ]
                        F = A @ (blk - 128.0) @ A.T
                        qc = np.round(F / q).astype(np.int64)
                        coeffs[ci][(gy, gx)] = qc
                        zz = np.array(
                            [qc[r_, c_] for r_, c_ in _JPEG_ZZ]
                        )
                        d = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        s = abs(d).bit_length()
                        bw.put(s, 4)
                        if s:
                            v = d if d > 0 else d + (1 << s) - 1
                            bw.put(v, s)
                        run = 0
                        for kk in range(1, 64):
                            v = int(zz[kk])
                            if v == 0:
                                run += 1
                                continue
                            while run >= 16:
                                bw.put(_JPEG_AC_CODE[0xF0], 8)
                                run -= 16
                            s = abs(v).bit_length()
                            bw.put(_JPEG_AC_CODE[(run << 4) | s], 8)
                            bw.put(
                                v if v > 0 else v + (1 << s) - 1, s
                            )
                            run = 0
                        if run:
                            bw.put(_JPEG_AC_CODE[0x00], 8)  # EOB
            mcount += 1
    bw.flush()

    dqt = _jpeg_seg(0xDB, bytes([0]) + bytes([q] * 64))
    dht_dc = _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12)
        + bytes(range(12)),
    )
    dht_ac = _jpeg_seg(
        0xC4,
        bytes([0x10]) + bytes([0] * 7 + [162] + [0] * 8)
        + bytes(_JPEG_AC_SYMS),
    )
    ncomp = len(planes)
    sof_comps = b"".join(
        bytes([ci + 1, (samps[ci][1] << 4) | samps[ci][0], 0])
        for ci in range(ncomp)
    )
    sof = _jpeg_seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w)
        + bytes([ncomp]) + sof_comps,
    )
    sos = _jpeg_seg(
        0xDA,
        bytes([ncomp])
        + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
        + bytes([0, 63, 0]),
    )
    head = b"\xff\xd8" + dqt + dht_dc + dht_ac
    if dri:
        head += _jpeg_seg(0xDD, struct.pack(">H", dri))
    return head + sof + sos + bytes(bw.out) + b"\xff\xd9", coeffs


def _jpeg_multiscan_from(pixels, groups, q=16):
    """Re-emit a 4:4:4 image's quantized coefficients (from
    ``_jpeg_encode``) as MULTIPLE sequential scans: ``groups`` is a
    tuple of component-index tuples, one scan per group, each with
    its own DC predictors and byte-aligned entropy segment. A
    single-component group walks that component's block grid; a
    multi-component group walks MCUs interleaved (4:4:4 → one block
    per component per MCU)."""
    import numpy as np

    payload, coeffs = _jpeg_encode(pixels, q=q)
    head = payload[: payload.find(b"\xff\xda")]
    h, w = np.asarray(pixels).shape[:2]
    nbh, nbw = -(-h // 8), -(-w // 8)
    out = bytearray(head)

    def put_block(bw, zzsrc, pred):
        zz = [int(zzsrc[r_, c_]) for r_, c_ in _JPEG_ZZ]
        d = zz[0] - pred
        s = abs(d).bit_length()
        bw.put(s, 4)
        if s:
            bw.put(d if d > 0 else d + (1 << s) - 1, s)
        run = 0
        for kk in range(1, 64):
            v = zz[kk]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                bw.put(_JPEG_AC_CODE[0xF0], 8)
                run -= 16
            s = abs(v).bit_length()
            bw.put(_JPEG_AC_CODE[(run << 4) | s], 8)
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run:
            bw.put(_JPEG_AC_CODE[0x00], 8)
        return zz[0]

    for group in groups:
        bw = _JpegBits()
        preds = {ci: 0 for ci in group}
        for gy in range(nbh):
            for gx in range(nbw):
                for ci in group:
                    preds[ci] = put_block(
                        bw, coeffs[ci][(gy, gx)], preds[ci]
                    )
        bw.flush()
        comps = b"".join(bytes([ci + 1, 0x00]) for ci in group)
        out += _jpeg_seg(
            0xDA, bytes([len(group)]) + comps + bytes([0, 63, 0])
        )
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


def test_multiscan_sequential_jpeg_decode():
    """T.81 allows a sequential frame's components to arrive over
    several scans (one per component, or partial interleaves). The
    multi-scan accumulator must decode them bit-identically to the
    standard single interleaved scan of the same coefficients."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    inter, _ = _jpeg_encode(img)
    want = MM.decode_jpeg_pixels(inter)

    # one scan per component
    multi = _jpeg_multiscan_from(img, groups=((0,), (1,), (2,)))
    assert np.array_equal(MM.decode_jpeg_pixels(multi), want)

    # partial interleave: (Y, Cb) MCU-walked together, Cr alone
    mixed = _jpeg_multiscan_from(img, groups=((0, 1), (2,)))
    assert np.array_equal(MM.decode_jpeg_pixels(mixed), want)

    # a component never scanned is a loud ValueError, not gray mush
    short = _jpeg_multiscan_from(img, groups=((0,), (1,)))
    with pytest.raises(ValueError, match="never scanned"):
        MM.decode_jpeg_pixels(short)


# progressive AC symbol set: EOBn (r<<4, r 0..14), ZRL, and
# (run<<4)|size — all at canonical 9-bit codes (176 symbols)
_JPEG_PAC_SYMS = [r << 4 for r in range(15)] + [0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_JPEG_PAC_CODE = {sym: i for i, sym in enumerate(_JPEG_PAC_SYMS)}


def _jpeg_encode_progressive(pixels, subsample=None, q=16, dri=0,
                             bands=((1, 5), (6, 63)), approx=1):
    """Progressive (SOF2) mirror of _jpeg_encode: the same forward DCT
    and quantized-coefficient store, emitted as a T.81 Annex G scan
    script — an interleaved DC first scan at Al=approx plus DC
    refinement bit scans down to 0, then per-component AC band scans
    (first pass with EOB-run/ZRL coding, refinement passes with
    correction bits and buffered-bit EOB runs, libjpeg jcphuff-style).
    Full refinement to Al=0 reconstructs the coefficients EXACTLY, so
    the decoder is checked against _jpeg_reference_decode like the
    baseline path. Returns (payload, coeffs)."""
    import struct

    import numpy as np

    A = np.array(
        [
            [
                (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        samps = [(1, 1)]
    else:
        r_, g_, b_ = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        sy, sx = subsample or (1, 1)
        if subsample:
            cb = cb.reshape(h // sy, sy, w // sx, sx).mean((1, 3))
            cr = cr.reshape(h // sy, sy, w // sx, sx).mean((1, 3))
        planes = [y, cb, cr]
        samps = [(sy, sx), (1, 1), (1, 1)]
    hmax = max(s[1] for s in samps)
    vmax = max(s[0] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    padded = []
    for plane, (vs, hs) in zip(planes, samps):
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        pp = np.zeros((ph, pw))
        pp[: plane.shape[0], : plane.shape[1]] = plane
        pp[plane.shape[0] :, : plane.shape[1]] = plane[-1:]
        pp[:, plane.shape[1] :] = pp[:, plane.shape[1] - 1 : plane.shape[1]]
        padded.append(pp)

    # quantized coefficient store + zigzag vectors per block
    coeffs = {ci: {} for ci in range(len(planes))}
    zz = {ci: {} for ci in range(len(planes))}
    for ci, (plane, (vs, hs)) in enumerate(zip(padded, samps)):
        for gy in range(mcuy * vs):
            for gx in range(mcux * hs):
                blk = plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8]
                Fq = np.round(A @ (blk - 128.0) @ A.T / q).astype(np.int64)
                coeffs[ci][(gy, gx)] = Fq
                zz[ci][(gy, gx)] = [int(Fq[r2, c2]) for r2, c2 in _JPEG_ZZ]

    # per-component NON-interleaved block grids (what AC scans cover)
    ni = []
    for vs, hs in samps:
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        ni.append((-(-ch // 8), -(-cw // 8)))

    def put_mag(bw, x, s):
        bw.put(x if x > 0 else x + (1 << s) - 1, s)

    def rst_break(bw, state):
        bw.flush()
        bw.out += bytes([0xFF, 0xD0 + state["rst"]])
        state["rst"] = (state["rst"] + 1) & 7

    def dc_scan(al, first):
        bw = _JpegBits()
        preds = [0] * len(planes)
        state = {"rst": 0}
        mcount = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcount and mcount % dri == 0:
                    rst_break(bw, state)
                    preds = [0] * len(planes)
                for ci, (vs, hs) in enumerate(samps):
                    for by in range(vs):
                        for bx in range(hs):
                            dc = zz[ci][(my * vs + by, mx * hs + bx)][0]
                            if first:
                                t = dc >> al
                                d = t - preds[ci]
                                preds[ci] = t
                                s = abs(d).bit_length()
                                bw.put(s, 4)
                                if s:
                                    put_mag(bw, d, s)
                            else:
                                bw.put((dc >> al) & 1, 1)
                mcount += 1
        bw.flush()
        ncomp = len(planes)
        sos = _jpeg_seg(
            0xDA,
            bytes([ncomp])
            + b"".join(bytes([ci + 1, 0x00]) for ci in range(ncomp))
            + bytes([0, 0, ((al + 1 if not first else 0) << 4) | al]),
        )
        return sos + bytes(bw.out)

    def ac_sym(bw, sym):
        bw.put(_JPEG_PAC_CODE[sym], 9)

    def ac_scan(ci, band, al, first):
        ss, se = band
        nih, niw = ni[ci]
        bw = _JpegBits()
        state = {"rst": 0}
        eobrun = 0
        bebits = []

        def flush_eob():
            nonlocal eobrun, bebits
            if eobrun:
                nb = eobrun.bit_length() - 1
                ac_sym(bw, nb << 4)
                if nb:
                    bw.put(eobrun - (1 << nb), nb)
                for bit in bebits:
                    bw.put(bit, 1)
                bebits = []
                eobrun = 0

        bcount = 0
        for gy in range(nih):
            for gx in range(niw):
                if dri and bcount and bcount % dri == 0:
                    flush_eob()
                    rst_break(bw, state)
                zzb = zz[ci][(gy, gx)]
                if first:
                    run = 0
                    for k in range(ss, se + 1):
                        v = zzb[k]
                        t = abs(v) >> al
                        if t == 0:
                            run += 1
                            continue
                        flush_eob()
                        while run > 15:
                            ac_sym(bw, 0xF0)
                            run -= 16
                        s = t.bit_length()
                        ac_sym(bw, (run << 4) | s)
                        put_mag(bw, t if v > 0 else -t, s)
                        run = 0
                    if run:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                else:
                    absv = [abs(zzb[k]) >> al for k in range(ss, se + 1)]
                    eobpos = 0
                    for i, t in enumerate(absv):
                        if t == 1:
                            eobpos = i + 1
                    r = 0
                    br = []
                    for i, t in enumerate(absv):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and i < eobpos:
                            flush_eob()
                            ac_sym(bw, 0xF0)
                            r -= 16
                            for bit in br:
                                bw.put(bit, 1)
                            br = []
                        if t > 1:
                            br.append(t & 1)
                            continue
                        flush_eob()
                        ac_sym(bw, (r << 4) | 1)
                        r = 0
                        bw.put(1 if zzb[ss + i] > 0 else 0, 1)
                        for bit in br:
                            bw.put(bit, 1)
                        br = []
                    if r > 0 or br:
                        eobrun += 1
                        bebits.extend(br)
                        if eobrun == 0x7FFF:
                            flush_eob()
                bcount += 1
        flush_eob()
        bw.flush()
        sos = _jpeg_seg(
            0xDA,
            bytes([1, ci + 1, 0x00])
            + bytes([ss, se, ((al + 1 if not first else 0) << 4) | al]),
        )
        return sos + bytes(bw.out)

    dqt = _jpeg_seg(0xDB, bytes([0]) + bytes([q] * 64))
    dht_dc = _jpeg_seg(
        0xC4,
        bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12)),
    )
    dht_ac = _jpeg_seg(
        0xC4,
        bytes([0x10]) + bytes([0] * 8 + [len(_JPEG_PAC_SYMS)] + [0] * 7)
        + bytes(_JPEG_PAC_SYMS),
    )
    ncomp = len(planes)
    sof_comps = b"".join(
        bytes([ci + 1, (samps[ci][1] << 4) | samps[ci][0], 0])
        for ci in range(ncomp)
    )
    sof = _jpeg_seg(
        0xC2,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp]) + sof_comps,
    )
    head = b"\xff\xd8" + dqt + dht_dc + dht_ac
    if dri:
        head += _jpeg_seg(0xDD, struct.pack(">H", dri))
    body = dc_scan(approx, True)
    for al in range(approx - 1, -1, -1):
        body += dc_scan(al, False)
    for ci in range(ncomp):
        for band in bands:
            body += ac_scan(ci, band, approx, True)
    for al in range(approx - 1, -1, -1):
        for ci in range(ncomp):
            for band in bands:
                body += ac_scan(ci, band, al, False)
    return head + sof + body + b"\xff\xd9", coeffs


def _jpeg_reference_decode(coeffs, samps, h, w, q=16):
    """Independent reconstruction from the encoder's quantized
    coefficients: explicit-loop IDCT (different implementation from
    the decoder's matrix product), replication upsample, BT.601."""
    import math

    import numpy as np

    def idct_block(qc):
        out = np.zeros((8, 8))
        for x in range(8):
            for yy in range(8):
                acc = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
                        cv = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
                        acc += (
                            cu * cv * qc[u, v] * q
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * yy + 1) * v * math.pi / 16)
                        )
                out[x, yy] = acc + 128.0
        return out

    planes = []
    for ci in sorted(coeffs):
        grid = coeffs[ci]
        ny = max(gy for gy, _ in grid) + 1
        nx = max(gx for _, gx in grid) + 1
        plane = np.zeros((ny * 8, nx * 8))
        for (gy, gx), qc in grid.items():
            plane[gy * 8 : gy * 8 + 8, gx * 8 : gx * 8 + 8] = (
                idct_block(qc)
            )
        planes.append(plane)
    vmax = max(s[0] for s in samps)
    hmax = max(s[1] for s in samps)
    full = []
    for plane, (vs, hs) in zip(planes, samps):
        up = np.repeat(
            np.repeat(plane, vmax // vs, 0), hmax // hs, 1
        )
        full.append(up[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0][..., None]), 0, 255).astype(
            np.uint8
        )
    y, cb, cr = full
    out = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        -1,
    )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _jpeg_test_image(h, w, channels):
    import numpy as np

    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    if channels == 1:
        return ((i * 7 + j * 13) % 251).astype(np.float64)
    return np.stack(
        [
            (i * 7 + j * 13) % 251,
            (i * 3 + j * 5 + 40) % 251,
            (i * 11 + j * 2 + 80) % 251,
        ],
        -1,
    ).astype(np.float64)


def test_jpeg_real_decode_grayscale_and_color():
    import numpy as np

    # grayscale 24x16 (3x2 blocks), rich AC content
    img = _jpeg_test_image(16, 24, 1)
    payload, coeffs = _jpeg_encode(img)
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(coeffs, [(1, 1)], 16, 24)
    assert got.shape == (16, 24, 1)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert (got == want).mean() > 0.99

    # 4:4:4 color 16x16
    img = _jpeg_test_image(16, 16, 3)
    payload, coeffs = _jpeg_encode(img)
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(
        coeffs, [(1, 1), (1, 1), (1, 1)], 16, 16
    )
    assert got.shape == (16, 16, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # header parse agrees
    assert MM.parse_media_header(payload) == {
        "format": "jpeg", "width": 16, "height": 16
    }


def test_jpeg_420_subsampling_and_restart_markers():
    import numpy as np

    img = _jpeg_test_image(32, 32, 3)
    payload, coeffs = _jpeg_encode(img, subsample=(2, 2))
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(
        coeffs, [(2, 2), (1, 1), (1, 1)], 32, 32
    )
    assert got.shape == (32, 32, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # restart markers every MCU: byte-aligned RSTn + DC predictor reset
    payload, coeffs = _jpeg_encode(img, subsample=(2, 2), dri=1)
    got = MM.decode_jpeg_pixels(payload)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_jpeg_progressive_grayscale_spectral_bands():
    import numpy as np

    # rich AC content, two spectral bands, one refinement level:
    # exercises DC first+refine, AC first (EOBRUN/ZRL) and AC
    # refinement (correction bits, buffered-bit EOB runs)
    img = _jpeg_test_image(16, 24, 1)
    payload, coeffs = _jpeg_encode_progressive(img)
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(coeffs, [(1, 1)], 16, 24)
    assert got.shape == (16, 24, 1)
    # full refinement restores the exact coefficients, so the only
    # slack is the decoder-vs-reference IDCT float boundary (±1)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # and the progressive payload must agree with the BASELINE
    # encoding of the same image block for block
    base_payload, base_coeffs = _jpeg_encode(img)
    base = MM.decode_jpeg_pixels(base_payload)
    assert np.array_equal(got, base)


def test_jpeg_progressive_color_subsampled_deep_approx():
    import numpy as np

    # 4:2:0 color, 24x24 (Y's non-interleaved grid 3x3 < padded 4x4
    # MCU grid — pins the interleaved-DC vs per-component-AC block
    # coverage difference), two successive-approximation levels,
    # single full band
    img = _jpeg_test_image(24, 24, 3)
    payload, coeffs = _jpeg_encode_progressive(
        img, subsample=(2, 2), bands=((1, 63),), approx=2
    )
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(
        coeffs, [(2, 2), (1, 1), (1, 1)], 24, 24
    )
    assert got.shape == (24, 24, 3)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_jpeg_progressive_restart_markers():
    import numpy as np

    img = _jpeg_test_image(16, 32, 1)
    payload, coeffs = _jpeg_encode_progressive(img, dri=2)
    got = MM.decode_jpeg_pixels(payload)
    want = _jpeg_reference_decode(coeffs, [(1, 1)], 16, 32)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_jpeg_progressive_poison():
    import pytest

    img = _jpeg_test_image(16, 16, 1)
    payload, _ = _jpeg_encode_progressive(img)

    # truncated mid-scan -> ValueError (never fabricated pixels)
    with pytest.raises(ValueError):
        MM.decode_jpeg_pixels(payload[:-8])
    # truncated before any scan completes its data
    with pytest.raises(ValueError):
        MM.decode_jpeg_pixels(payload[:40])
    # corrupt entropy byte: strict rejection or a (valid) different
    # decode are acceptable; a crash is not
    corrupt = bytearray(payload)
    corrupt[-12] ^= 0x55
    try:
        MM.decode_jpeg_pixels(bytes(corrupt))
    except ValueError:
        pass


def test_jpeg_poison_and_unsupported_variants():
    import struct

    import numpy as np
    import pytest

    img = _jpeg_test_image(16, 16, 1)
    payload, _ = _jpeg_encode(img)

    # truncated scan -> ValueError
    with pytest.raises(ValueError):
        MM.decode_jpeg_pixels(payload[:-10])
    # corrupt entropy stream: an invalid Huffman path or run-past-end
    # must raise ValueError, never fabricate pixels
    corrupt = bytearray(payload)
    corrupt[-12] ^= 0xAA
    try:
        MM.decode_jpeg_pixels(bytes(corrupt))
    except ValueError:
        pass  # strict rejection is the contract...
    # ...and through the poison-safe stats path it yields NULLs, and a
    # VALID payload decodes for real (exercised via mapInPandas below)

    # a baseline payload with its SOF marker swapped to SOF2 is a
    # spec-invalid progressive stream (DC scan must have Se == 0):
    # typed rejection, never a crash and never fabricated pixels
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se != 0"):
        MM.decode_jpeg_pixels(prog)
    # SOF10 (arithmetic progressive) became a real decoder in round
    # 11 — the same splice is now a spec-invalid ARITHMETIC
    # progressive stream (same Se != 0 violation), typed rejection;
    # the NotImplementedError pin moves to SOF11 (lossless)
    arith = payload.replace(b"\xff\xc0", b"\xff\xca", 1)
    with pytest.raises(ValueError, match="Se != 0"):
        MM.decode_jpeg_pixels(arith)
    lossless = payload.replace(b"\xff\xc0", b"\xff\xcb", 1)
    with pytest.raises(NotImplementedError):
        MM.decode_jpeg_pixels(lossless)

    # oversized declared dims fail fast (byte cap)
    big = payload.replace(
        struct.pack(">HH", 16, 16), struct.pack(">HH", 8192, 8192), 1
    )
    with pytest.raises(ValueError, match="too large"):
        MM.decode_jpeg_pixels(big)


def test_jpeg_through_decoded_stats_path(spark):
    import numpy as np

    img = _jpeg_test_image(16, 24, 1)
    payload, coeffs = _jpeg_encode(img)
    want = _jpeg_reference_decode(coeffs, [(1, 1)], 16, 24).astype(int)
    corrupt = payload[:-10]
    media = spark.createDataFrame(
        [
            (1, bytearray(payload), "image"),
            (2, bytearray(corrupt), "image"),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(media).collect()
    }
    r1 = rows[1]
    assert r1["format"] == "jpeg"
    assert r1["n_units"] == 16 * 24
    # decoder may differ from the reference by ±1 on a handful of
    # pixels (float .5 boundaries) — bound the sum accordingly
    assert abs(r1["content_sum"] - int(want.sum())) <= 16 * 24
    assert rows[2]["format"] == "jpeg"
    assert rows[2]["content_sum"] is None  # poison -> clean NULLs


def _bmp_bytes_gradient(w: int, h: int, seed: int) -> bytes:
    import struct

    stride = (w * 3 + 3) // 4 * 4
    body = bytes((seed + i) % 256 for i in range(stride * h))
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


def test_resize_image_stats_matches_numpy_reference(spark):
    """2× box downsample of a real decoded BMP equals an explicit
    numpy floor-mean reference, orientation included; factor=1 is the
    identity (same stats as extract_decoded_stats); poison payloads
    yield NULL stats."""
    payload = _bmp_bytes_gradient(16, 4, seed=77)
    px = MM.decode_bmp_pixels(payload).astype("int64")
    ref = px.reshape(2, 2, 8, 2, 3).sum(axis=(1, 3)) // 4
    media = spark.createDataFrame(
        [
            (1, bytearray(payload), "image"),
            (2, bytearray(b"BM\x01trunc"), "image"),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in MM.resize_image_stats(media, factor=2).collect()
    }
    good = rows[1]
    assert (good["out_h"], good["out_w"]) == (2, 8)
    assert good["content_sum"] == int(ref.sum())
    assert good["content_min"] == int(ref.min())
    assert good["content_max"] == int(ref.max())
    assert good["top_row_sum"] == int(ref[0].sum())
    assert rows[2]["content_sum"] is None

    ident = {
        r["media_id"]: r
        for r in MM.resize_image_stats(media, factor=1).collect()
    }[1]
    assert ident["content_sum"] == int(px.sum())
    assert ident["top_row_sum"] == int(px[0].sum())
    assert (ident["out_h"], ident["out_w"]) == (4, 16)


def test_extract_audio_features_known_waveform(spark):
    """A hand-built WAV with a known sign pattern: features must match
    the closed-form energy/peak/crossing counts; non-WAV payloads get
    NULL features."""
    import struct

    samples = [100, -200, 300, -400, 0, -1, 7]
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    media = spark.createDataFrame(
        [(5, bytearray(wav), "audio"), (6, bytearray(b"nope"), "audio")],
        MM.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: r
        for r in MM.extract_audio_features(media).collect()
    }
    got = rows[5]
    assert got["n_samples"] == 7
    assert got["energy_sq"] == sum(s * s for s in samples)
    assert got["peak_abs"] == 400
    # sign pattern + - + - 0 - +  (0 counts as non-negative): 6 flips
    assert got["zero_crossings"] == 6
    assert rows[6]["n_samples"] is None

# --- pluggable native-decode seam (operators/multimodal.py
# _load_native_codecs / _make_pixel_decoder) ---

def test_native_seam_defaults_to_pure_and_env_gate(monkeypatch):
    import numpy as np

    payload = _bmp_bytes_gradient(8, 6, seed=3)
    pure = {"bmp": MM.decode_bmp_pixels}

    # no env: pure path only
    monkeypatch.delenv("SPARK_GRAFT_NATIVE_DECODE", raising=False)
    assert MM._load_native_codecs(pure) == {}
    dec = MM._make_pixel_decoder(pure, {}, 64)
    assert np.array_equal(dec("bmp", payload), MM.decode_bmp_pixels(payload))

    # env "1" in this container: PIL absent -> empty registry, pure path
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_DECODE", "1")
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        assert MM._load_native_codecs(pure) == {}

    # the clearly-marked deterministic fakes exercise the plumbing
    monkeypatch.setenv("SPARK_GRAFT_NATIVE_DECODE", "fake")
    fakes = MM._load_native_codecs(pure)
    assert set(fakes) == {"bmp"}
    dec = MM._make_pixel_decoder(pure, fakes, 1)
    assert np.array_equal(dec("bmp", payload), MM.decode_bmp_pixels(payload))

    # fake-drift: the every-call cross-check fails LOUD with the
    # non-poison exception
    import pytest

    monkeypatch.setenv("SPARK_GRAFT_NATIVE_DECODE", "fake-drift")
    drift = MM._load_native_codecs(pure)
    dec = MM._make_pixel_decoder(pure, drift, 1)
    with pytest.raises(MM.NativeDecoderDrift):
        dec("bmp", payload)
    # sampling stride honored: stride 3 checks calls 1, 4, 7...
    dec = MM._make_pixel_decoder(pure, drift, 3)
    with pytest.raises(MM.NativeDecoderDrift):
        dec("bmp", payload)
    dec2 = MM._make_pixel_decoder(pure, drift, 0)  # 0 disables checks
    assert dec2("bmp", payload) is not None


def test_synthesize_bmp_wav_variant_media_round_trip(spark):
    """Paletted-BMP and float-WAV variant containers decode back to
    their generating closed forms through the mapInPandas stats path
    (the math the bmp_wav_variants_stats SQL oracle recomputes)."""
    docs = spark.createDataFrame(
        [(d, "t") for d in range(20, 26)], "doc_id long, text string"
    )
    media = MM.synthesize_bmp_wav_variant_media(docs)
    got = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(media).collect()
    }
    for d in range(20, 26):
        r = got[d]
        if d % 2 == 0:
            vals = [
                (10, 5, 3)[c] * ((d * 3 + i) % 16)
                for i in range(32) for c in range(3)
            ]
            assert r["format"] == "bmp"
            assert r["n_units"] == 96
            assert r["top_row_sum"] == sum(vals[:24])
        else:
            vals = [
                ((d * 13 + i * 37) % 65536) - 32768 for i in range(128)
            ]
            assert r["format"] == "wav"
            assert r["n_units"] == 128
            assert r["top_row_sum"] is None
        assert r["content_sum"] == sum(vals)
        assert r["content_min"] == min(vals)
        assert r["content_max"] == max(vals)


def test_jpeg_12bit_grayscale_decode():
    """12-bit baseline grayscale JPEG decodes for real: Pq=1 (16-bit)
    quantization tables, DC categories beyond 11, 2048 level shift,
    uint16 output. A DC-only block is uniform dc*q0/8 + 2048
    exactly."""
    import numpy as np
    import pytest

    enc = MM._make_dc_jpeg12()
    for dc in (0, 7, -50, 999, -1000):
        px = MM.decode_jpeg_pixels(enc(dc))
        assert px.shape == (8, 16, 1) and px.dtype == np.uint16
        want = 2048 + 2 * dc
        assert int(px.min()) == int(px.max()) == want, (dc, want)

    # DC category 12 (|dc| >= 2048) exercises the 12-bit category
    # range the 8-bit path rejects
    px = MM.decode_jpeg_pixels(enc(-2048, q0=8))
    assert int(px.min()) == int(px.max()) == 0  # 2048 - 2048

    # 12-bit COLOR (Ns=3 YCbCr) decodes for real since round 10:
    # zero chroma DCs sit exactly at the 12-bit center 2048, so every
    # channel is the closed-form 2048 + 2*dc_Y — a wrong chroma
    # center (the 8-bit 128) would shift channels by thousands.
    cenc = MM._make_dc_jpeg12_color()
    for dcy in (0, 7, -50, 999):
        cpx = MM.decode_jpeg_pixels(cenc([dcy, 0, 0]))
        assert cpx.shape == (8, 16, 3) and cpx.dtype == np.uint16
        want = 2048 + 2 * dcy
        assert int(cpx.min()) == int(cpx.max()) == want, (dcy, want)

    # a 3-component SOF spliced onto the single-component scan is now
    # MALFORMED input (the scan never covers components 2 and 3) —
    # poison-typed ValueError, not a decode and not a refusal
    import struct

    def seg(marker, body):
        return (
            bytes([0xFF, marker])
            + struct.pack(">H", len(body) + 2) + body
        )

    color_sof = seg(
        0xC0,
        bytes([12]) + struct.pack(">HH", 8, 8)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    base = enc(0)
    sof_at = base.find(b"\xff\xc0")
    sof_len = 2 + struct.unpack(">H", base[sof_at + 2 : sof_at + 4])[0]
    spliced = base[:sof_at] + color_sof + base[sof_at + sof_len :]
    with pytest.raises(ValueError, match="never scanned"):
        MM.decode_jpeg_pixels(spliced)

    # the refusal pin moves to a genuinely unsupported family (SOF9
    # arithmetic SEQUENTIAL became a real decoder in round 11):
    # LOSSLESS JPEG (SOF3) is a typed NotImplementedError
    lossless = base[:sof_at] + b"\xff\xc3" + base[sof_at + 2 :]
    with pytest.raises(NotImplementedError, match="SOF"):
        MM.decode_jpeg_pixels(lossless)

    # 12-bit FOUR-component (CMYK) decodes for real since round 11
    # (precision-generic inverted-ink math in _jpeg_color_out): take
    # the real 8-bit CMYK stream, patch only the SOF precision byte
    # to 12 — the DC-only payload is equally valid at 12-bit (Pq=0
    # tables are legal for extended precision), and planes become
    # 2048 + 2·dc with RGB = floor(c·k/4095 + 0.5)
    cmyk = MM._make_dc_jpeg_cmyk()([1, 2, 3, 4], 0)
    csof = cmyk.find(b"\xff\xc0")
    cmyk12 = bytearray(cmyk)
    assert cmyk12[csof + 4] == 8  # SOF sample-precision byte
    cmyk12[csof + 4] = 12
    px12 = MM.decode_jpeg_pixels(bytes(cmyk12))
    assert px12.dtype == np.uint16 and px12.shape == (8, 16, 3)
    p = [2048.0 + 2 * d for d in (1, 2, 3, 4)]
    exp12 = [int(np.floor(p[i] * p[3] / 4095 + 0.5)) for i in range(3)]
    assert [int(px12[0, 0, i]) for i in range(3)] == exp12

    # 12-bit PROGRESSIVE grayscale decodes for real too (three-scan
    # successive-approximation script, same closed form)
    penc = MM._make_progressive_dc_jpeg()
    for dc in (5, -321):
        ppx = MM.decode_jpeg_pixels(penc(dc, prec=12))
        assert ppx.dtype == np.uint16
        assert int(ppx.min()) == int(ppx.max()) == 2048 + 2 * dc

    # a bad DQT precision nibble is poison (ValueError), not decode
    dqt_at = base.find(b"\xff\xdb")
    bad = bytearray(base)
    bad[dqt_at + 4] = 0x20  # Pq=2: not a thing
    with pytest.raises(ValueError, match="DQT precision"):
        MM.decode_jpeg_pixels(bytes(bad))


def test_extract_decoded_stats_12bit_jpeg(spark):
    """12-bit JPEGs flow through the mapInPandas stats path with
    values far beyond uint8 (the closed form the jpeg12_decode_stats
    oracle recomputes)."""
    docs = spark.createDataFrame(
        [(d, "t") for d in (3, 100, 777)], "doc_id long, text string"
    )
    media = MM.synthesize_jpeg12_media(docs)
    got = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(media).collect()
    }
    for d in (3, 100, 777):
        want = 2048 + 2 * ((d * 11) % 2000 - 1000)
        r = got[d]
        assert r["format"] == "jpeg"
        assert r["n_units"] == 128
        assert r["content_sum"] == want * 128
        assert r["content_min"] == want
        assert r["content_max"] == want
        assert r["top_row_sum"] == want * 16


def test_synthesize_png_variant_media_round_trip(spark):
    """The five PNG/GIF variant containers (palette, Adam7 4-bit,
    16-bit, interlaced GIF, 1-bit) decode back to their generating
    closed forms through the real mapInPandas stats path — the same
    math the png_variants_stats SQL oracle recomputes."""
    docs = spark.createDataFrame(
        [(d, "t") for d in range(5, 15)], "doc_id long, text string"
    )
    media = MM.synthesize_png_variant_media(docs)
    got = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(media).collect()
    }
    assert len(got) == 10

    def expect(d):
        k = d % 5
        if k == 0:
            vals = [
                (17, 13, 7)[c] * ((d * 3 + i) % 16)
                for i in range(32) for c in range(3)
            ]
            return "png", vals, 24
        if k == 1:
            vals = [((d + i) % 16) * 17 for i in range(45)]
            return "png", vals, 9
        if k == 2:
            vals = [
                (d * 2654435761 + i * 48271) % 65536 for i in range(18)
            ]
            return "png", vals, 6
        if k == 3:
            vals = [
                (31, 17, 11)[c] * ((d * 5 + i) % 8)
                for i in range(108) for c in range(3)
            ]
            return "gif", vals, 36
        vals = [((d + i) % 2) * 255 for i in range(40)]
        return "png", vals, 10

    for d in range(5, 15):
        fmt, vals, top_n = expect(d)
        r = got[d]
        assert r["format"] == fmt, (d, r)
        assert r["n_units"] == len(vals), (d, r)
        assert r["content_sum"] == sum(vals), (d, r)
        assert r["content_min"] == min(vals), (d, r)
        assert r["content_max"] == max(vals), (d, r)
        assert r["top_row_sum"] == sum(vals[:top_n]), (d, r)


def _jpeg_sof_header(subsampled):
    """Minimal JFIF prefix with one SOF0: enough for
    _jpeg_is_subsampled's segment walk."""
    import struct

    comps = (
        [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
        if subsampled
        else [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    )
    sof = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([len(comps)])
    for cid, fac, tq in comps:
        sof += bytes([cid, fac, tq])
    return (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    )


def _rle_bmp(stream: bytes, w: int, h: int, bpp: int, comp: int) -> bytes:
    import struct

    pal = b"".join(bytes([3 * j, 5 * j, 10 * j, 0]) for j in range(16))
    off = 54 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(stream), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, comp, len(stream),
        2835, 2835, 16, 16,
    )
    return header + dib + pal + stream


def test_bmp_rle8_and_rle4_decode():
    """BI_RLE8/BI_RLE4: encoded runs, absolute mode (word-aligned),
    EOL/EOB escapes, bottom-up flip through the palette — decoded
    pixels must equal the uncompressed-paletted rendering of the same
    index raster."""
    import numpy as np

    bmp, _, _, _, _ = MM._make_content_decoders()

    # 4x2 raster, logical rows: [1,2,3,4] / [5,6,7,8] -> stored
    # bottom-up: row0=[5,6,7,8] (absolute mode), row1=[1,2,3,4]
    # (encoded single-pixel runs), EOL between, EOB at the end
    s8 = (
        bytes([0, 4, 5, 6, 7, 8])           # absolute, count 4 (even)
        + bytes([0, 0])                      # EOL
        + bytes([1, 1, 1, 2, 1, 3, 1, 4])    # runs (1,v) each
        + bytes([0, 0, 0, 1])                # EOL + EOB
    )
    px8 = bmp(_rle_bmp(s8, 4, 2, 8, 1))
    pal = np.array(
        [[10 * j, 5 * j, 3 * j] for j in range(16)], np.uint8
    )
    want = pal[np.array([[1, 2, 3, 4], [5, 6, 7, 8]])]
    assert np.array_equal(px8, want)

    # same raster as RLE4: encoded runs alternate the byte's nibbles
    s4 = (
        bytes([0, 4, 0x56, 0x78])           # absolute, 2 packed bytes
        + bytes([0, 0])
        + bytes([2, 0x12, 2, 0x34])         # runs of 2: [1,2], [3,4]
        + bytes([0, 0, 0, 1])
    )
    px4 = bmp(_rle_bmp(s4, 4, 2, 4, 2))
    assert np.array_equal(px4, want)

    # odd-count encoded RLE4 run: [9,5,9] from one byte's nibbles
    s4odd = (
        bytes([3, 0x95, 1, 0x20])           # row: 9,5,9 then single 2
        + bytes([0, 0])                      # (high nibble first)
        + bytes([4, 0x11, 0, 0])            # second stored row: all 1
        + bytes([0, 1])
    )
    px = bmp(_rle_bmp(s4odd, 4, 2, 4, 2))
    assert np.array_equal(px[1], pal[np.array([9, 5, 9, 2])])
    assert np.array_equal(px[0], pal[np.array([1, 1, 1, 1])])


def test_bmp_rle_delta_and_short_rows_fill_zero():
    """The delta escape moves the cursor; skipped pixels (and rows
    ended early) keep palette index 0 — the conventional rendering of
    the spec's 'undefined' pixels."""
    import numpy as np

    bmp, _, _, _, _ = MM._make_content_decoders()
    stream = (
        bytes([1, 7])           # stored row 0: one pixel of 7
        + bytes([0, 2, 2, 1])   # delta: right 2, up 1 (skips rest)
        + bytes([1, 9])         # stored row 1, x=3: one pixel of 9
        + bytes([0, 0])         # EOL
        + bytes([0, 1])         # EOB (row 2+ untouched -> 0)
    )
    px = bmp(_rle_bmp(stream, 4, 3, 8, 1))
    pal = np.array([[10 * j, 5 * j, 3 * j] for j in range(16)], np.uint8)
    stored = np.zeros((3, 4), int)
    stored[0, 0] = 7
    stored[1, 3] = 9
    want = pal[stored[::-1]]  # bottom-up flip
    assert np.array_equal(px, want)


def test_bmp_rle_poison_payloads_raise():
    import pytest

    bmp, _, _, _, _ = MM._make_content_decoders()
    # run past row end
    with pytest.raises(ValueError, match="past row"):
        bmp(_rle_bmp(bytes([6, 1, 0, 1]), 4, 2, 8, 1))
    # missing end-of-bitmap
    with pytest.raises(ValueError, match="end-of-bitmap"):
        bmp(_rle_bmp(bytes([1, 1, 0, 0]), 4, 2, 8, 1))
    # truncated absolute run
    with pytest.raises(ValueError, match="truncated"):
        bmp(_rle_bmp(bytes([0, 4, 1, 2]), 4, 2, 8, 1))
    # delta past bitmap
    with pytest.raises(ValueError, match="delta past"):
        bmp(_rle_bmp(bytes([0, 2, 9, 9, 0, 1]), 4, 2, 8, 1))
    # top-down RLE is invalid
    with pytest.raises(ValueError, match="top-down"):
        bmp(_rle_bmp(bytes([0, 1]), 4, -2, 8, 1))
    # compression/bpp mismatch
    with pytest.raises(ValueError, match="BI_RLE8"):
        bmp(_rle_bmp(bytes([0, 1]), 4, 2, 4, 1))
    # BI_BITFIELDS stays a typed refusal
    with pytest.raises(NotImplementedError):
        bmp(_rle_bmp(bytes([0, 1]), 4, 2, 8, 3))


def test_jpeg_cmyk_and_ycck_decode():
    """4-component Adobe JPEG (round 10): APP14 transform 0 (CMYK
    planes stored directly) and 2 (YCCK) both decode to RGB under the
    inverted-ink convention; a 4-component frame WITHOUT APP14
    defaults to CMYK (the libjpeg convention); a nonsense transform
    raises the typed refusal."""
    import math

    import numpy as np
    import pytest

    _, _, _, _, jpeg = MM._make_content_decoders()
    mk = MM._make_dc_jpeg_cmyk()

    def expect(dcs, transform):
        p = [128.0 + 2 * d for d in dcs]
        if transform == 0:
            c, m, y, k = p
        else:
            yy, cb, cr, k = p
            c = min(max(yy + 1.402 * (cr - 128.0), 0.0), 255.0)
            m = min(
                max(
                    yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                    0.0,
                ),
                255.0,
            )
            y = min(max(yy + 1.772 * (cb - 128.0), 0.0), 255.0)
        return tuple(
            math.floor(v * k / 255.0 + 0.5) for v in (c, m, y)
        )

    for dcs, transform in [
        ([10, -20, 30, 40], 0),
        ([10, -20, 30, 40], 2),
        ([-50, 49, -1, 0], 0),
        ([25, 5, -35, 45], 2),
    ]:
        px = jpeg(mk(dcs, transform))
        assert px.shape == (8, 16, 3) and px.dtype == np.uint8
        assert {tuple(v) for row in px for v in row} == {
            expect(dcs, transform)
        }

    # APP14 absent -> CMYK default: strip the APP14 segment (it is
    # the first marker after SOI, 2 + 2 + 14 bytes long)
    payload = mk([10, -20, 30, 40], 0)
    assert payload[2:4] == b"\xff\xee"
    stripped = payload[:2] + payload[4 + 14 :]
    assert np.array_equal(jpeg(stripped), jpeg(payload))

    # transform=1 (YCbCr) on a 4-component frame: typed refusal
    with pytest.raises(NotImplementedError, match="transform"):
        jpeg(mk([10, -20, 30, 40], 1))


def test_jpeg_adobe_rgb_three_component():
    """A 3-component frame with APP14 transform=0 stores RGB planes
    directly (no BT.601 step) — the other side of the Adobe dispatch."""
    import struct

    import numpy as np

    _, _, _, _, jpeg = MM._make_content_decoders()
    base = MM._make_dc_jpeg()(14)  # grayscale: uniform 156

    # splice a 3-component SOF/SOS around the same DC tables: easier
    # to build from the CMYK builder by dropping component 4
    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
    dht_dc = seg(
        0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    )
    dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 8, 16) + bytes([3])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3)),
    )
    sos = seg(
        0xDA,
        bytes([3]) + b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
        + bytes([0, 63, 0]),
    )
    bits = []

    def put(v, n):
        bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

    dcs = [10, -20, 30]
    for mcu in range(2):
        for ci in range(3):
            d = dcs[ci] if mcu == 0 else 0
            s = abs(d).bit_length()
            put(s, 4)
            if s:
                put(d if d > 0 else d + (1 << s) - 1, s)
            put(0, 1)
    bits += [1] * ((-len(bits)) % 8)
    scan = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for bit in bits[i : i + 8]:
            byte = (byte << 1) | bit
        scan.append(byte)
        if byte == 0xFF:
            scan.append(0x00)
    body = dqt + dht_dc + dht_ac + sof + sos + bytes(scan) + b"\xff\xd9"
    rgb_app14 = seg(0xEE, b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([0]))
    px_rgb = jpeg(b"\xff\xd8" + rgb_app14 + body)
    # transform=0: planes ARE RGB -> uniform (148, 88, 188)
    assert {tuple(v) for row in px_rgb for v in row} == {(148, 88, 188)}
    # without APP14 the same payload goes through BT.601 (different)
    px_ycc = jpeg(b"\xff\xd8" + body)
    assert not np.array_equal(px_rgb, px_ycc)
    assert base is not None  # silence unused (sanity that helper works)


def test_jpeg_cmyk_multiscan_sequential():
    """4-component sequential JPEG whose components arrive one scan
    each (Ns=1 x4) — drives the multiscan accumulator + the shared
    _prog_reconstruct through the new 4-component color path."""
    import math
    import struct

    import numpy as np

    _, _, _, _, jpeg = MM._make_content_decoders()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def one_comp_scan(cid, dc):
        sos = seg(0xDA, bytes([1, cid, 0x00, 0, 63, 0]))
        bits = []

        def put(v, n):
            bits.extend((v >> i) & 1 for i in range(n - 1, -1, -1))

        for blk in range(2):  # niw=2 blocks (16 wide, 1x1 sampling)
            d = dc if blk == 0 else 0
            s = abs(d).bit_length()
            put(s, 4)
            if s:
                put(d if d > 0 else d + (1 << s) - 1, s)
            put(0, 1)
        bits += [1] * ((-len(bits)) % 8)
        scan = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for bit in bits[i : i + 8]:
                byte = (byte << 1) | bit
            scan.append(byte)
            if byte == 0xFF:
                scan.append(0x00)
        return sos + bytes(scan)

    dcs = [10, -20, 30, 40]
    app14 = seg(0xEE, b"Adobe" + struct.pack(">HHH", 100, 0, 0) + bytes([2]))
    dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
    dht_dc = seg(
        0xC4, bytes([0x00]) + bytes([0, 0, 0, 12] + [0] * 12) + bytes(range(12))
    )
    dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
    sof = seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", 8, 16) + bytes([4])
        + b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3, 4)),
    )
    payload = (
        b"\xff\xd8" + app14 + dqt + dht_dc + dht_ac + sof
        + b"".join(one_comp_scan(cid, dcs[cid - 1]) for cid in (1, 2, 3, 4))
        + b"\xff\xd9"
    )
    px = jpeg(payload)
    # same closed form as the interleaved builder at transform=2
    interleaved = jpeg(MM._make_dc_jpeg_cmyk()(dcs, 2))
    assert np.array_equal(px, interleaved)
    yy, cb, cr, k = (128.0 + 2 * d for d in dcs)
    c = min(max(yy + 1.402 * (cr - 128.0), 0.0), 255.0)
    assert px[0, 0, 0] == math.floor(c * k / 255.0 + 0.5)


def _reference_png_decode(payload: bytes):
    """An INDEPENDENT from-the-spec PNG decoder: scalar per-byte
    unfilter straight from RFC 2083 pseudocode, per-sample bit
    extraction, no shared code or structure with the production
    decoder (which is numpy-vectorized with per-filter fast paths).
    Exists as the permanent stand-in for a native codec in this
    container (Pillow et al. are uninstallable — TUNING.md): two
    implementations written independently agreeing byte-for-byte
    across the randomized variant space is the strongest cross-check
    available without third-party binaries."""
    import struct
    import zlib

    import numpy as np

    b = bytes(payload)
    assert b[:8] == b"\x89PNG\r\n\x1a\n"
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = [tuple(data[i : i + 3]) for i in range(0, len(data), 3)]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    w, h, depth, ct, _, _, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    raw = zlib.decompress(bytes(idat))
    bpp = max(1, nch * depth // 8)

    def unfilter_pass(ph, pw, off):
        stride = (pw * nch * depth + 7) // 8
        rows = []
        prev = bytearray(stride)
        for y in range(ph):
            ft = raw[off]
            line = bytearray(raw[off + 1 : off + 1 + stride])
            off += 1 + stride
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    line[x] = (line[x] + a) & 0xFF
                elif ft == 2:
                    line[x] = (line[x] + up) & 0xFF
                elif ft == 3:
                    line[x] = (line[x] + (a + up) // 2) & 0xFF
                elif ft == 4:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        up if pb <= pc else c
                    )
                    line[x] = (line[x] + pr) & 0xFF
            rows.append(bytes(line))
            prev = line
        return rows, off

    def samples_of(row: bytes, pw: int):
        out = []
        if depth == 16:
            for i in range(pw * nch):
                out.append((row[2 * i] << 8) | row[2 * i + 1])
        elif depth == 8:
            out = list(row[: pw * nch])
        else:
            per = 8 // depth
            mask = (1 << depth) - 1
            for i in range(pw * nch):
                byte = row[i // per]
                shift = 8 - depth * (i % per + 1)
                out.append((byte >> shift) & mask)
        return out

    dt = np.uint16 if depth == 16 else np.uint8
    grid = np.zeros((h, w, nch), np.uint32)
    adam7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    passes = adam7 if interlace else ((0, 0, 1, 1),)
    off = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        rows, off = unfilter_pass(ph, pw, off)
        for j, row in enumerate(rows):
            vals = samples_of(row, pw)
            for i in range(pw):
                for cch in range(nch):
                    grid[y0 + j * dy, x0 + i * dx, cch] = vals[
                        i * nch + cch
                    ]
    if ct == 3:
        pal = np.array(plte, np.uint8)
        return pal[grid[:, :, 0]]
    if depth < 8:  # gray bit replication
        grid = grid * (255 // ((1 << depth) - 1))
    return grid.astype(dt)


def test_native_seam_against_independent_reference_decoder():
    """Round-10 permanent closure of the native-seam watch: no real
    codec library is importable here, so the seam's strongest possible
    exercise is a SECOND independently-written decoder registered as
    the 'native' side, with the production drift machinery
    (xcheck_every=1) comparing every payload byte-for-byte across a
    randomized sweep of the full PNG variant space. A disagreement in
    either implementation, or a seam bug (shape/tolerance/skip logic),
    raises NativeDecoderDrift / AssertionError here."""
    import numpy as np

    dec = MM._make_pixel_decoder(
        {"png": MM.decode_png_pixels},
        {"png": _reference_png_decode},
        1,  # cross-check every payload
    )
    rng = np.random.default_rng(77)
    n_checked = 0
    for case in range(30):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 12))
        interlace = int(rng.integers(0, 2))
        filters = {i: int(rng.integers(0, 5)) for i in range(h * 4)}
        kind = case % 4
        if kind == 0:
            ch = int(rng.choice([3, 4]))
            img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
            payload = _png_build(
                img, 8, 2 if ch == 3 else 6, interlace=interlace,
                filters=filters,
            )
        elif kind == 1:
            img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            payload = _png_build(
                img, 8, 0, interlace=interlace, filters=filters
            )
        elif kind == 2:
            depth = int(rng.choice([1, 2, 4]))
            img = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
            if rng.integers(0, 2):
                pal = [
                    tuple(int(x) for x in rng.integers(0, 256, 3))
                    for _ in range(1 << depth)
                ]
                payload = _png_build(
                    img, depth, 3, palette=pal, interlace=interlace,
                    filters=filters,
                )
            else:
                payload = _png_build(
                    img, depth, 0, interlace=interlace, filters=filters
                )
        else:
            img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
            payload = _png_build(
                img, 16, 0, interlace=interlace, filters=filters
            )
        out = dec("png", payload)  # raises NativeDecoderDrift on any
        assert out is not None  # disagreement between implementations
        n_checked += 1
    assert n_checked == 30


def test_native_xcheck_skips_pure_undecodable_variants():
    """A variant only the native codec can decode (pure raises
    NotImplementedError/ValueError) must NOT leak the pure decoder's
    exception out of a sampled cross-check: output would otherwise
    depend on which call positions the sampling stride lands on."""
    import numpy as np

    px = np.full((4, 4, 3), 7, np.uint8)

    def pure_refuses(_p):
        raise NotImplementedError("pure decoder lacks this variant")

    def pure_chokes(_p):
        raise ValueError("pure decoder thinks it is corrupt")

    for pure_fn in (pure_refuses, pure_chokes):
        dec = MM._make_pixel_decoder(
            {"bmp": pure_fn}, {"bmp": lambda p: px}, 1
        )
        # every call sampled; every call must still return native out
        for _ in range(3):
            assert np.array_equal(dec("bmp", b"payload"), px)


def test_native_xcheck_pure_crash_surfaces():
    """The skip is NARROW: a pure decoder CRASHING (IndexError/KeyError —
    not the typed NotImplementedError/ValueError boundary signals) on a
    sampled payload must surface as NativeDecoderDrift (round-10 ADVICE:
    the raw crash types are exactly what the stats path poison-nulls per
    row, so leaking them raw made a sampled crash a nondeterministic NULL
    instead of a loud deterministic failure)."""
    import numpy as np
    import pytest

    px = np.full((4, 4, 3), 7, np.uint8)

    def pure_crashes(_p):
        raise IndexError("pure decoder crashed on a decodable payload")

    dec = MM._make_pixel_decoder({"bmp": pure_crashes}, {"bmp": lambda p: px}, 1)
    with pytest.raises(MM.NativeDecoderDrift, match="IndexError"):
        dec("bmp", b"payload")


def test_native_xcheck_all_skipped_warns_per_format():
    """If EVERY sampled cross-check for a format skipped (>=8 samples),
    drift detection never ran for that format — a RuntimeWarning flags
    it (round-10 ADVICE downgraded this from a task-killing raise: an
    all-native-only corpus is a legitimate workload). Counters are PER
    FORMAT so one format's skips never blame another, and a single
    successful comparison clears the condition for its format."""
    import warnings

    import numpy as np
    import pytest

    px = np.full((4, 4, 3), 7, np.uint8)

    def pure_refuses(_p):
        raise NotImplementedError("native-only variant")

    dec = MM._make_pixel_decoder(
        {"bmp": pure_refuses, "png": lambda p: px},
        {"bmp": lambda p: px, "png": lambda p: px},
        1,
    )
    # interleave a HEALTHY png with the all-skipping bmp: the bmp
    # warning must still fire (per-format counters) and name bmp
    for _ in range(7):
        dec("bmp", b"payload")
        dec("png", b"payload")
    with pytest.warns(RuntimeWarning, match="native-bmp"):
        np.testing.assert_array_equal(dec("bmp", b"payload"), px)
    # the healthy format never warns
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dec("png", b"payload")

    # one real comparison early -> later skips never trip the counter
    calls = {"n": 0}

    def pure_first_only(_p):
        calls["n"] += 1
        if calls["n"] == 1:
            return px
        raise NotImplementedError("native-only variant")

    dec2 = MM._make_pixel_decoder(
        {"bmp": pure_first_only}, {"bmp": lambda p: px}, 1
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for _ in range(20):
            assert np.array_equal(dec2("bmp", b"payload"), px)


def test_native_xcheck_jpeg_tolerances():
    """JPEG cross-check reflects legitimate decoder variance:
    4:4:4/grayscale allows IDCT rounding (max 2, mean 0.5);
    subsampled compares aggregates (mean|diff| 3.0, mean bias 1.0)
    because fancy vs replication chroma upsampling legitimately
    differs by tens at edges. A genuinely wrong image still trips
    both."""
    import numpy as np
    import pytest

    sub = _jpeg_sof_header(subsampled=True)
    full = _jpeg_sof_header(subsampled=False)
    assert MM._jpeg_is_subsampled(sub) is True
    assert MM._jpeg_is_subsampled(full) is False
    assert MM._jpeg_is_subsampled(b"\xff\xd8\x00") is True  # loose

    rng = np.random.default_rng(5)
    ref = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)

    def mk(native_out, payload):
        dec = MM._make_pixel_decoder(
            {"jpeg": lambda p: ref}, {"jpeg": lambda p: native_out}, 1
        )
        return lambda: dec("jpeg", payload)

    # 4:4:4: +/-1 IDCT rounding passes, +3 somewhere fails
    wobble = ref.astype(np.int16)
    wobble[0::2] += 1
    wobble[1::4] -= 1
    ok444 = np.clip(wobble, 0, 255).astype(np.uint8)
    assert mk(ok444, full)() is not None
    bad444 = ref.copy()
    bad444[0, 0, 0] = (int(ref[0, 0, 0]) + 3) % 256
    with pytest.raises(MM.NativeDecoderDrift):
        mk(bad444, full)()

    # subsampled: large LOCAL chroma-edge diffs pass if aggregates
    # stay close (zero-sum perturbation, mean|diff| <= 3.0)
    edge = ref.astype(np.int64)
    edge[0, 0:2, 2] += 40   # fancy-vs-replication style edge diff
    edge[0, 2:4, 2] -= 40   # balanced: no mean bias
    edge = np.clip(edge, 0, 255).astype(np.uint8)
    assert mk(edge, sub)() is not None
    # but the SAME perturbation on a 4:4:4 payload is drift
    with pytest.raises(MM.NativeDecoderDrift):
        mk(edge, full)()
    # a wrong image (different content) trips the aggregate check
    wrong = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    with pytest.raises(MM.NativeDecoderDrift):
        mk(wrong, sub)()
    # and a systematic bias trips it even with small per-pixel diffs
    biased = np.clip(ref.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    with pytest.raises(MM.NativeDecoderDrift):
        mk(biased, sub)()
    # gross LOCAL corruption (one wrong region, aggregates diluted on a
    # big image): max|diff| > 128 trips the localized bound even though
    # mean|diff| and bias stay tiny (round-9 ADVICE)
    big = np.full((64, 64, 3), 120, np.uint8)
    corrupt = big.copy()
    corrupt[0:4, 0:8, :] = 255  # one wrong MCU, half blown high...
    corrupt[4:8, 0:8, :] = 1    # ...half blown low: no mean bias
    dec_big = MM._make_pixel_decoder(
        {"jpeg": lambda p: big}, {"jpeg": lambda p: corrupt}, 1
    )
    diff = np.abs(corrupt.astype(np.int64) - big.astype(np.int64))
    assert diff.mean() <= 3.0  # global aggregates alone would pass...
    assert abs(corrupt.astype(np.float64).mean() - 120.0) <= 1.0
    with pytest.raises(MM.NativeDecoderDrift):  # ...max|diff| trips
        dec_big("jpeg", sub)


def test_native_seam_through_spark_decoded_stats(spark):
    import numpy as np

    rows = [
        (i, bytearray(_bmp_bytes_gradient(8, 6, seed=i)), "image")
        for i in range(1, 7)
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    want = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(media).collect()
    }
    # a correct injected native codec: identical stats through the
    # real mapInPandas path, cross-checked on every payload
    # codecs defined as closures so cloudpickle ships them by value
    # into the python workers (a test-module reference would not import)
    dec_bmp = MM.decode_bmp_pixels

    def fake_native(p, _d=dec_bmp):
        return _d(p)

    def drifting_native(p, _d=dec_bmp):
        out = _d(p).copy()
        out[..., 0] = 255 - out[..., 0]
        return out

    got = {
        r["media_id"]: r
        for r in MM.extract_decoded_stats(
            media, native_codecs={"bmp": fake_native},
            xcheck_every=1,
        ).collect()
    }
    for k in want:
        assert tuple(want[k]) == tuple(got[k])

    # a DRIFTING native codec kills the task (loud), never NULL-rows
    import pytest

    with pytest.raises(Exception, match="drift|NativeDecoderDrift"):
        MM.extract_decoded_stats(
            media, native_codecs={"bmp": drifting_native},
            xcheck_every=1,
        ).collect()
