"""End-to-end curation job: every gate fires on a planted fixture and the
packed output lands as an atomic snapshot version."""

from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.etl.datapipe import (
    run_curation_job,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew distinct potions under a bright autumn moon tonight"
)
GOOD2 = (
    "colorless green ideas sleep furiously as the orchestra rehearses "
    "twelve entirely different melodies beside the frozen harbor wall"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew distinct potions under a bright autumn moon again"
)
EVAL = (
    "benchmark held out sentence about galaxies colliding near the "
    "great attractor in deep intergalactic space observed tonight"
)
CONTAM = (
    "benchmark held out sentence about galaxies colliding near the "
    "great attractor in deep intergalactic space observed yesterday"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for i, (t, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_curation_job_all_gates_and_snapshot(spark, tmp_path):
    docs = _docs(
        spark,
        [
            (GOOD, "web"),          # 0: survives
            (GOOD2, "web"),         # 1: survives
            ("tiny", "web"),        # 2: gated out (length/quality)
            (GOOD, "web"),          # 3: exact dup of 0
            (NEAR, "web"),          # 4: near dup of 0 (one token differs)
            (CONTAM, "books"),      # 5: contaminated vs eval set
        ],
    )
    ev = _docs(spark, [(EVAL, "eval")])
    out = str(tmp_path / "corpus")
    res = run_curation_job(
        spark,
        docs,
        out,
        ctx_tokens=8,
        min_chars=50,
        eval_docs=ev,
        contamination_max=0.5,
    )
    assert res.n_input == 6
    assert res.n_gated_out == 1
    assert res.n_exact_dups == 1
    assert res.n_near_dups == 1
    assert res.n_contaminated == 1
    assert res.n_curated == 2
    assert res.version == 0

    packed = S.read(spark, out)
    kept = {r["doc_id"] for r in packed.collect()}
    assert kept == {0, 1}
    # packing is gapless: pack count per shard covers the token total
    tot = packed.agg(F.sum("n_tokens")).first()[0]
    assert res.n_packs == -(-tot // 8)  # ceil

    # a second run publishes the next version; time travel keeps v0
    res2 = run_curation_job(
        spark, docs, out, ctx_tokens=8, min_chars=50,
        eval_docs=ev, contamination_max=0.5,
    )
    assert res2.version == 1
    assert {r["doc_id"] for r in S.read(spark, out, 0).collect()} == {0, 1}


def test_curation_job_no_eval_set(spark, tmp_path):
    docs = _docs(spark, [(GOOD, "web"), (GOOD2, "web")])
    res = run_curation_job(
        spark, docs, str(tmp_path / "c"), ctx_tokens=16, min_chars=50
    )
    assert res.n_contaminated == 0
    assert res.n_curated == 2
    assert res.n_packs > 0
