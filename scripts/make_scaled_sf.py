"""Synthesize an N-times-scaled testdata dir from an existing one,
for the round-9 scale probe (VERDICT task 5): replicate every fact
table with KEY-SPACE OFFSETS so foreign keys stay consistent
(replica r adds r*(max_key+1) to custkey/orderkey/partkey/suppkey/
doc_id/vec_id/event_id/user_id), keep the dimension tables
(region/nation) as-is, and SUFFIX each document's words per replica
(word -> word~r3) so cross-replica near-duplicate structure does not
hand the dedup legs artificial quadratic work (10 exact copies of
every doc would put all replicas in the same MinHash buckets: bucket
sizes x10 = verify pairs x100, a replication artifact, not a scale
signal). Suffixing replaced the original word ROTATION in round 13:
rotation preserves each doc's token SET, so every token-set-keyed
operator (SimHash signatures, bag-of-words stats) still saw 10
identical replicas — the r13 10x probe measured simhash pair output
x99 instead of x10 — and docs whose word count divides the rotation
step kept IDENTICAL text, quadratically densifying shingle buckets
too (jaccard-prefix candidates x100). Per-word suffixes make every
replica's token set, shingle set, and md5 fingerprint disjoint from
every other replica's while preserving all WITHIN-replica dup
structure, which is what a same-density 10x corpus looks like.
Probe numbers recorded before round 13's suffix change used the
rotating scaler and are not comparable on the dedup legs.
The same reasoning de-duplicates every OTHER similarity-bearing
column: entity names (c_name/s_name/p_name) get a per-replica
suffix at edit distance >= 2 so FastSS ER sees 10x the entities
rather than 10 exact copies of each, and each embedding vector gets
one replica-dependent dimension shifted so LSH/IVF buckets are not
handed 10 identical members per vector.

pyarrow/pandas only — no Spark session, so it can run alongside a
Spark test suite. Layout mirrors the source dir (one
``<table>.parquet`` per table); row groups are sized so Spark can
split the bigger files across tasks.

Usage: python scripts/make_scaled_sf.py SRC_DIR DST_DIR [FACTOR]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

# per-table key columns drawing from a shared key SPACE; every space
# is offset by r * (max over all columns in the space + 1)
KEY_SPACES: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
}
DIMENSIONS = ("region", "nation")
# Several catalog legs build synthetic twins by offsetting doc_id/vec_id
# with literal +100000/+200000 (twin ids sit above the real range at
# every driver/bench scale). A scaled build must keep that invariant
# PER REPLICA: stride the doc/vec spaces by at least 10M so each
# replica's twins land inside its own private id range instead of
# colliding with the next replica's real ids (the r13 sf10 probe
# measured minhash_fast output COLLAPSING 5040 -> 1120 because
# colliding ids merged different texts under one doc). 100 replicas x
# 10M + twins stays far under int64 (and under int32 for factor<=100).
MIN_STRIDE = {"doc": 10_000_000, "vec": 10_000_000}


def _replica_words(text: str, r: int) -> str:
    """Per-replica word suffix: every word of replica r > 0 becomes
    ``word~r{r}`` (whitespace tokenization glues the suffix into the
    token), so replicas share NO tokens, shingles, or fingerprints
    while each replica's internal dup structure survives verbatim."""
    if r == 0:
        return text
    return " ".join(f"{w}~r{r}" for w in text.split(" "))


def main(src: str, dst: str, factor: int) -> None:
    os.makedirs(dst, exist_ok=True)
    tables = {
        f[: -len(".parquet")]: pq.read_table(os.path.join(src, f))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    }
    offsets: dict[tuple[str, str], int] = {}
    for space, cols in KEY_SPACES.items():
        # tolerate partial source dirs (e.g. a documents-only sf10 build
        # for the per-leg probe): a key space whose tables are all absent
        # is skipped; present tables still share one consistent offset
        present = [(t, c) for t, c in cols if t in tables]
        if not present:
            continue
        space_max = max(
            int(pa.compute.max(tables[t].column(c)).as_py() or 0)
            for t, c in present
        )
        for t, c in present:
            offsets[(t, c)] = max(space_max + 1, MIN_STRIDE.get(space, 0))

    for name, tbl in tables.items():
        out_path = os.path.join(dst, f"{name}.parquet")
        if name in DIMENSIONS:
            pq.write_table(tbl, out_path)
            print(f"{name}: {tbl.num_rows} rows (dimension, copied)")
            continue
        reps = []
        for r in range(factor):
            cols = []
            for field in tbl.schema:
                col = tbl.column(field.name)
                off = offsets.get((name, field.name))
                if off is not None and r > 0:
                    col = pa.compute.add(col, r * off)
                    col = col.cast(field.type)
                elif name == "documents" and field.name == "text":
                    col = pa.array(
                        [_replica_words(v, r) for v in col.to_pylist()],
                        type=field.type,
                    )
                elif r > 0 and field.name in (
                    "c_name", "s_name", "p_name"
                ):
                    # DOUBLED-digit suffix: edit distance >= 2 between
                    # every replica pair, so ER sees 10x entities, not
                    # 10 copies of each. The single-digit form ~r{r}
                    # violated that claim — "~r1" vs "~r2" is ONE
                    # substitution, so all nine suffixed replicas of
                    # an entity were pairwise edit-distance-1 and the
                    # FastSS leg merged them (r13 probe: candidates
                    # x62 at 10x, golden records collapsing 150k ->
                    # 7.7k — the "densification" of earlier rounds was
                    # this artifact). Doubling each digit ("~r33",
                    # "~r77") gives >= 2 differing positions for
                    # same-length ids and >= 2 length difference
                    # otherwise.
                    sfx = "".join(ch * 2 for ch in str(r))
                    col = pa.array(
                        [f"{v}~r{sfx}" for v in col.to_pylist()],
                        type=field.type,
                    )
                elif r > 0 and field.name == "embedding":
                    # ROTATE each replica's vectors by a seeded random
                    # ORTHOGONAL matrix (QR of a gaussian draw). An
                    # exact isometry — norms and within-replica
                    # geometry preserved — while cross-replica cosines
                    # concentrate at 0 +- 1/sqrt(dim), so P(cos >=
                    # 0.99) between replicas is negligible: replica r
                    # models genuinely NEW vectors. Two weaker
                    # transforms failed here (r13, measured at 100x):
                    # ROLLS interact with the engine's deterministic
                    # SRP hyperplanes — that family is a rank-1
                    # lattice whose planes are cyclic shifts of one
                    # period-97 sequence, so a rolled vector's
                    # signature is a plane-permuted copy of the
                    # original's and replicas pile into aligned
                    # buckets (max bucket 2,820, sum bucket^2 7x over
                    # the cap*N bound, leg effectively hung; rolls
                    # also repeat exactly at r == dim). Axis-aligned
                    # REFLECTIONS (per-dim sign flips) fix the
                    # signature coupling but preserve per-dim energy
                    # profiles, and clustered corpora then produce
                    # ~1M chance sign-alignment pairs at cos >= 0.99
                    # across 100 replicas (measured 1.27M vs the
                    # expected 200k leg output).
                    import numpy as _np

                    dim = len(col[0]) if len(col) else 0
                    rng = _np.random.default_rng(1_000_003 * r)
                    q, _ = _np.linalg.qr(
                        rng.standard_normal((dim, dim))
                    )
                    M = _np.stack(
                        [
                            _np.asarray(v, dtype=_np.float64)
                            for v in col.to_pylist()
                        ]
                    )
                    col = pa.array(
                        (M @ q.T).tolist(), type=field.type
                    )
                cols.append(col)
            if name == "documents":
                # keep n_chars consistent with the rotated text
                idx = tbl.schema.get_field_index("n_chars")
                cols[idx] = pa.array(
                    [
                        len(v)
                        for v in cols[
                            tbl.schema.get_field_index("text")
                        ].to_pylist()
                    ],
                    type=tbl.schema.field(idx).type,
                )
            reps.append(pa.Table.from_arrays(cols, schema=tbl.schema))
        out = pa.concat_tables(reps)
        rg = max(10_000, out.num_rows // 16)
        pq.write_table(out, out_path, row_group_size=rg)
        print(
            f"{name}: {tbl.num_rows} -> {out.num_rows} rows "
            f"(row_group_size={rg})"
        )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(src, dst, factor)
