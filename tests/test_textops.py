from __future__ import annotations

from pyspark.sql import functions as F

from _lakehouse_architecture_for_e_commerce_transactions_spark.functions import (
    text as T,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
    textdedup as TD,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy cat", "a"),  # near-dup of 1
        (3, "completely different content about spark engines", "a"),
        (4, "the quick brown fox jumps over the lazy dog", "a"),  # exact dup of 1
        (5, "der hund und die katze sind nicht da", "b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_exact_dedup(spark):
    out = {r["keeper"]: r["copies"] for r in TD.exact_dedup(_docs(spark), "doc_id", "text").collect()}
    assert out[1] == 2  # docs 1 and 4 collapse, min id kept
    assert len(out) == 4


def test_shingles_and_token_stats(spark):
    df = _docs(spark).select(
        "doc_id",
        T.token_count(F.col("text")).alias("n"),
        F.size(T.shingles(F.col("text"), 3)).alias("n_sh"),
    )
    got = {r["doc_id"]: (r["n"], r["n_sh"]) for r in df.collect()}
    assert got[1] == (9, 7)  # 9 tokens → 7 distinct trigrams
    # short text: fewer tokens than n → zero shingles, not negative
    short = spark.createDataFrame([(9, "two words", "x")], "doc_id long, text string, source string")
    n_sh = short.select(F.size(T.shingles(F.col("text"), 3)).alias("s")).collect()[0]["s"]
    assert n_sh == 0


def test_ngram_jaccard_finds_near_dup(spark):
    pairs = TD.ngram_jaccard_pairs(
        _docs(spark), "doc_id", "text", n=3, threshold=0.4, block_col="source"
    ).collect()
    found = {(r["doc1"], r["doc2"]): r["jaccard"] for r in pairs}
    assert found[(1, 4)] == 1.0  # exact dup
    assert (1, 2) in found and 0.4 <= found[(1, 2)] < 1.0  # near dup
    assert all(d in {(1, 2), (1, 4), (2, 4)} for d in found)  # 3 and 5 clean


def test_minhash_lsh_candidates_and_verification(spark):
    verified = TD.minhash_dedup_verified(
        _docs(spark), "doc_id", "text", n=3, k=8, rows_per_band=2, threshold=0.5
    ).collect()
    got = {(r["doc1"], r["doc2"]): r["jaccard"] for r in verified}
    assert got[(1, 4)] == 1.0  # exact dup always survives
    assert (1, 3) not in got and (1, 5) not in got  # unrelated docs filtered


def test_minhash_fast_finds_planted_dups(spark):
    pairs = {
        (r["doc1"], r["doc2"])
        for r in TD.minhash_lsh_pairs_fast(
            _docs(spark), "doc_id", "text", n=3, k=8, rows_per_band=2
        ).collect()
    }
    assert (1, 4) in pairs  # exact dup: identical signatures, always found
    assert not any(3 in p or 5 in p for p in pairs)  # unrelated docs clean


def test_simhash_near_dup_distance(spark):
    sig = {
        r["doc"]: r["simhash"]
        for r in TD.simhash_signatures(_docs(spark), "doc_id", "text", 16).collect()
    }
    assert sig[1] == sig[4]  # identical docs → identical simhash
    ham_near = bin(sig[1] ^ sig[2]).count("1")
    ham_far = bin(sig[1] ^ sig[5]).count("1")
    assert ham_near <= ham_far  # near-dup at most as far as unrelated doc


def test_lang_id(spark):
    df = _docs(spark).select("doc_id", T.lang_id(F.col("text")).alias("lang"))
    got = {r["doc_id"]: r["lang"] for r in df.collect()}
    assert got[1] == "en"
    assert got[5] == "de"


def test_quality_score_bounds(spark):
    df = _docs(spark).select(T.quality_score(F.col("text")).alias("q"))
    for r in df.collect():
        assert 0.0 <= r["q"] <= 1.0


def test_simhash_pairs_banding_lossless(spark):
    """Banded candidate generation must equal brute-force all-pairs for
    hamming <= max_hamming (pigeonhole losslessness)."""
    docs = _docs(spark)
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in TD.simhash_near_dup_pairs(
            docs, "doc_id", "text", n_bits=32, n_bands=4, max_hamming=3
        ).collect()
    }
    sig = {
        r["doc"]: r["simhash"]
        for r in TD.simhash_signatures(docs, "doc_id", "text", 32).collect()
    }
    ids = sorted(sig)
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    assert got == brute
    assert got[(1, 4)] == 0  # planted exact dup


def test_simhash_pairs_rejects_lossy_params(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        TD.simhash_near_dup_pairs(
            _docs(spark), "doc_id", "text", n_bands=4, max_hamming=4
        )
    with _pytest.raises(ValueError):
        TD.simhash_near_dup_pairs(
            _docs(spark), "doc_id", "text", n_bits=30, n_bands=4, max_hamming=3
        )


def test_bigram_and_bpe_survive_short_docs_under_ansi(spark, tmp_path):
    """Spark 4's bare driver session runs with ANSI on: sequence(1, 0)
    yields a DESCENDING [1, 0] and toks[1] on a one-token doc throws
    INVALID_ARRAY_INDEX unless the adjacent-pair builders filter
    size >= 2 first. Regression for both q_bigram_logprob and
    bpe.adjacent_pair_counts on a corpus containing empty and one-token
    documents."""
    from pyspark.sql import functions as F

    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators import (
        bpe as B,
    )
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.catalog import (
        q_bigram_logprob,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c a b", "en", "s", 9),
            (2, "solo", "en", "s", 4),
            (3, "", "en", "s", 0),
            (4, "   ", "en", "s", 3),
            (5, "x y x y", "en", "s", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    old = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = q_bigram_logprob(spark, str(tmp_path)).collect()
        got = {r["doc_id"]: r["n_bigrams"] for r in rows}
        assert got == {1: 4, 5: 3}  # short docs drop out, none crash
        toks = docs.select(
            F.split(F.trim(F.lower("text")), r"\s+").alias("toks")
        )
        pairs = {
            (r["a"], r["b"]): r["n"]
            for r in B.adjacent_pair_counts(toks).collect()
        }
        assert pairs[("a", "b")] == 2 and pairs[("x", "y")] == 2
    finally:
        if old is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", old)


def test_simhash_64_bit_signatures(spark):
    """n_bits=64 must work (the r13 bitwise-fold fix: the old arithmetic
    Σ bit·2^pos overflowed the signed-long literal at 2^63) and stay
    lossless under banding: banded pairs equal brute-force all-pairs on
    the collected signatures, sign bit and all."""
    docs = _docs(spark)
    sig = {
        r["doc"]: r["simhash"]
        for r in TD.simhash_signatures(docs, "doc_id", "text", 64).collect()
    }
    assert sig[1] == sig[4]  # identical docs → identical 64-bit sigs
    # at least one signature should use the top bits (sign-bit region):
    # 5 docs × 64 fair coin bits makes an all-top-bits-zero fleet
    # astronomically unlikely, and a negative value proves bit 0 landed
    # in the sign bit without overflow
    got = {
        (r["doc1"], r["doc2"]): r["hamming"]
        for r in TD.simhash_near_dup_pairs(
            docs, "doc_id", "text", n_bits=64, n_bands=4, max_hamming=3
        ).collect()
    }
    ids = sorted(sig)
    mask = (1 << 64) - 1
    brute = {
        (a, b): bin((sig[a] ^ sig[b]) & mask).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((sig[a] ^ sig[b]) & mask).count("1") <= 3
    }
    assert got == brute
    assert got[(1, 4)] == 0
