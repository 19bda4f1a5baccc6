"""AVI/MJPEG video plumbing (`operators/multimodal.py` AVI layer):
real RIFF container walk, header metadata extraction, frame sampling
through the real JPEG decoder with closed-form expected pixels, and
the poison discipline (damaged containers NULL one row; one bad frame
NULLs only itself)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    multimodal as MM,
)


def _docs(spark, ids):
    return spark.createDataFrame([Row(doc_id=i) for i in ids])


def _payloads(spark, ids):
    return {
        r.media_id: bytes(r.payload)
        for r in MM.synthesize_mjpeg_media(_docs(spark, ids)).collect()
    }


def _media_df(spark, pairs):
    return spark.createDataFrame(
        [Row(media_id=i, payload=p, media_type="video") for i, p in pairs]
    )


def test_container_info_and_frame_walk(spark):
    p = _payloads(spark, [5])[5]
    info = MM.avi_container_info(p)
    assert info["n_frames"] == 3 + 5 % 4 == 4
    assert (info["width"], info["height"]) == (16, 8)
    assert info["usec_per_frame"] == 40000
    assert info["streams"] == [("vids", "MJPG")]
    frames = MM.avi_frame_payloads(p)
    assert len(frames) == 4
    for f, fp in enumerate(frames):
        px = MM.decode_jpeg_pixels(fp)
        want = 128 + 2 * ((5 * 7 + f * 13) % 100 - 50)
        assert int(px.min()) == int(px.max()) == want


def test_extract_video_meta_and_poison(spark):
    p = _payloads(spark, [3])[3]
    df = _media_df(
        spark,
        [(3, p), (99, b"not a riff at all"), (100, p[:20])],
    )
    got = {r.media_id: r for r in MM.extract_video_meta(df).collect()}
    assert (got[3].n_frames, got[3].width, got[3].codec) == (6, 16, "MJPG")
    assert got[99].n_frames is None
    assert got[100].n_frames is None


def test_sampled_frame_stats_closed_form(spark):
    doc = 7
    p = _payloads(spark, [doc])[doc]
    rows = MM.sample_video_frame_stats(
        _media_df(spark, [(doc, p)]), every_n=2
    ).collect()
    n = 3 + doc % 4
    assert sorted(r.frame_idx for r in rows) == list(range(0, n, 2))
    for r in rows:
        v = 128 + 2 * ((doc * 7 + r.frame_idx * 13) % 100 - 50)
        assert r.n_frames == n
        assert r.px_count == 128
        assert (r.px_min, r.px_max, r.px_sum) == (v, v, 128 * v)


def test_every_n_one_decodes_every_frame(spark):
    doc = 2
    p = _payloads(spark, [doc])[doc]
    rows = MM.sample_video_frame_stats(
        _media_df(spark, [(doc, p)]), every_n=1
    ).collect()
    assert sorted(r.frame_idx for r in rows) == list(range(3 + doc % 4))
    with pytest.raises(ValueError, match="every_n"):
        MM.sample_video_frame_stats(_media_df(spark, [(doc, p)]), 0)


def test_one_poisoned_frame_nulls_only_itself(spark):
    doc = 1
    p = bytearray(_payloads(spark, [doc])[doc])
    # corrupt the SECOND frame's JPEG SOI marker in place: find the
    # movi list, then the second 00dc chunk body
    first = p.find(b"00dc")
    second = p.find(b"00dc", first + 4)
    p[second + 8 : second + 10] = b"XX"  # was ff d8
    rows = MM.sample_video_frame_stats(
        _media_df(spark, [(doc, bytes(p))]), every_n=1
    ).collect()
    by_idx = {r.frame_idx: r for r in rows}
    assert by_idx[1].px_sum is None  # the damaged frame
    ok = [r for r in rows if r.frame_idx != 1]
    assert ok and all(r.px_sum is not None for r in ok)


def test_damaged_container_yields_one_null_row(spark):
    doc = 4
    p = bytearray(_payloads(spark, [doc])[doc])
    # overrun: grow a chunk size past the container end
    first = p.find(b"00dc")
    p[first + 4 : first + 8] = struct.pack("<I", 1 << 30)
    rows = MM.sample_video_frame_stats(
        _media_df(spark, [(doc, bytes(p))]), every_n=1
    ).collect()
    assert len(rows) == 1
    assert rows[0].n_frames is None and rows[0].px_sum is None
