"""Hash-family helpers for MinHash / LSH / SimHash.

Built on ``md5`` (hex string) rather than Spark's ``hash``/``xxhash64``:
md5 is available with identical output in every engine (Spark, DuckDB,
Trino, ...), which makes the sketch operators oracle-checkable. The
*lexicographic minimum of salted md5 hex digests* is a valid min-hash — any
uniform hash with a total order works; we never need the integer value.

Salting: hash_i(x) = md5(i || ':' || x) gives k independent hash functions
from one primitive.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def salted_md5(value: Column, salt: int) -> Column:
    return F.md5(F.concat(F.lit(f"{salt}:"), value))


CHUNK_HEX = 8  # 32-bit hash chunks: ample headroom for per-doc shingle counts


def minhash_aggs(shingle_col: str, k: int) -> list[Column]:
    """k min-hash aggregate expressions over an exploded shingle column —
    ``groupBy(doc).agg(*minhash_aggs("shingle", k))`` yields the signature.

    Hash family: consecutive 8-hex (32-bit) chunks of salted md5 digests —
    one digest yields four independent hash functions, so k functions cost
    ⌈k/4⌉ md5 calls per shingle instead of k (the digest is the dominant
    cost at 10⁶+ shingles). Lexicographic min of fixed-width hex chunks is
    a valid min-hash; identical slicing reproduces in any oracle engine.
    """
    per_digest = 32 // CHUNK_HEX
    return [
        F.min(
            F.substring(
                salted_md5(F.col(shingle_col), i // per_digest),
                (i % per_digest) * CHUNK_HEX + 1,
                CHUNK_HEX,
            )
        ).alias(f"mh{i}")
        for i in range(k)
    ]


def band_keys(k: int, rows_per_band: int) -> list[Column]:
    """LSH banding: concatenate ``rows_per_band`` signature parts per band and
    re-hash; docs sharing any band key become candidate pairs."""
    assert k % rows_per_band == 0
    cols = []
    for b in range(k // rows_per_band):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    return cols


def hex_bit(hex_col: Column, bit: int) -> Column:
    """Bit ``bit`` (0 = MSB of first hex digit) of an md5 hex string, as 0/1.

    conv(hexdigit, 16, 10) keeps everything integer-typed and engine-portable.
    """
    digit = F.substring(hex_col, bit // 4 + 1, 1)
    val = F.conv(digit, 16, 10).cast("int")
    shift = 3 - (bit % 4)
    return F.shiftright(val, shift) % 2


def simhash_bits(token_col: str, n_bits: int = 16) -> list[Column]:
    """SimHash aggregate: per bit, sign of Σ_tokens (±1) — majority vote.
    Use after exploding weighted tokens: groupBy(doc).agg(*simhash_bits(...)).
    """
    h = F.md5(F.col(token_col))
    return [
        F.when(
            F.sum(F.when(hex_bit(h, i) == 1, 1).otherwise(-1)) >= 0, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias(f"b{i}")
        for i in range(n_bits)
    ]
