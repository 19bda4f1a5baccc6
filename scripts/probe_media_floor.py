"""r15 (verdict task 8): settle whether the six media-decode legs'
walls are a genuine decode-CPU floor, or avoidable per-task /
per-batch init overhead.

Measurements:
1. decoder-construction cost (`_make_content_decoders` +
   `_make_header_parser`) — the once-per-task init the iterator-style
   mapInPandas amortizes across its batches;
2. pure-Python per-row decode CPU, timed in-driver over the exact
   payloads a leg feeds its executors (sampled), per format;
3. the implied parallel floor: total decode CPU / cores vs the
   measured leg wall at sf0.1.

If wall ≈ floor + small constant, the legs are decode-bound and no
further mapInPandas tuning can move them; the per-row CPU budget is
recorded so later rounds stop re-litigating them.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    python scripts/probe_media_floor.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    multimodal as MM,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
from _lakehouse_architecture_for_e_commerce_transactions_spark.session import (
    default_parallelism,
    get_spark,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import load_table

LEGS = [
    "jpeg_progressive_stats",
    "png_variants_stats",
    "jpeg12_decode_stats",
    "bmp_wav_variants_stats",
    "jpeg_cmyk_stats",
    "jpeg_arith_stats",
]

SYNTH = {
    "jpeg_progressive_stats": "synthesize_progressive_jpeg_media",
    "png_variants_stats": "synthesize_png_variant_media",
    "bmp_wav_variants_stats": "synthesize_bmp_wav_variant_media",
    "jpeg_cmyk_stats": "synthesize_cmyk_jpeg_media",
    "jpeg_arith_stats": "synthesize_arith_jpeg_media",
    "jpeg12_decode_stats": "synthesize_jpeg12_media",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-media-floor")
    cores = default_parallelism()

    # 1. per-task init cost
    t0 = time.perf_counter()
    decoders = MM._make_content_decoders()
    header = MM._make_header_parser()
    init_s = time.perf_counter() - t0
    print(f"decoder construction (once per task): {init_s * 1000:.2f} ms")

    docs = load_table(spark, sf_dir, "documents")
    bmp_core, wav_core, png_core, gif_core, jpeg_core = decoders
    pure = {"bmp": bmp_core, "png": png_core, "gif": gif_core,
            "jpeg": jpeg_core}

    for leg, synth in SYNTH.items():
        media = getattr(MM, synth)(docs)
        sample = media.limit(400).collect()
        # decode in-driver with the same `one()` logic shape
        t0 = time.perf_counter()
        n = 0
        byfmt: dict[str, float] = {}
        for r in sample:
            b = bytes(r["payload"])
            meta = header(b) or {}
            fmt = meta.get("format")
            t1 = time.perf_counter()
            try:
                if fmt in pure:
                    pure[fmt](b)
                elif fmt == "wav":
                    wav_core(b)
            except Exception:
                pass
            byfmt[fmt] = byfmt.get(fmt, 0.0) + time.perf_counter() - t1
            n += 1
        cpu = time.perf_counter() - t0
        # full corpus row count for the floor estimate
        total_rows = media.count()
        per_row = cpu / max(n, 1)
        floor = per_row * total_rows / cores
        print(
            f"{leg}: sampled {n} rows, {per_row * 1000:.2f} ms/row "
            f"(per-format s: { {k: round(v, 3) for k, v in byfmt.items()} }), "
            f"corpus {total_rows} rows -> ideal {cores}-core decode floor "
            f"{floor:.2f}s"
        )


if __name__ == "__main__":
    main()
