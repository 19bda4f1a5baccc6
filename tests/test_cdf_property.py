"""Property test for the change feed: for RANDOM (seeded) programs of
table operations — appends, DV deletes, DV updates, matched merges
(with and without write-time CDC), partition-rewrite deletes, compacts,
renames — replaying the whole feed from `earliest` must reconstruct
exactly the table's final live multiset. This is the CDC contract in
one line: feed ≡ table."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.cdf import (
    table_changes,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.tables import (
    TableSpec,
)


def _spec(partitioned: bool) -> TableSpec:
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    return TableSpec(
        name="t",
        schema=StructType(
            [
                StructField("k", LongType(), False),
                StructField("p", LongType(), False),
                StructField("amt", LongType(), True),
            ]
        ),
        primary_key="k",
        partition_by=("p",) if partitioned else (),
    )


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, p=k % 3, amt=a) for k, a in rows]
    )


def _apply_random_program(spark, rng, path, spec, partitioned, n_ops):
    """Run n_ops random ops; returns the op names executed."""
    next_key = [0]

    def fresh(n):
        out = [(next_key[0] + i, rng.randrange(100)) for i in range(n)]
        next_key[0] += n
        return out

    if partitioned:
        S.merge_commit(spark, _rows_df(spark, fresh(6)), path, spec)
    else:
        S.commit(spark, _rows_df(spark, fresh(6)), path)
    done = ["init"]
    for _ in range(n_ops):
        live = [r.k for r in S.read(spark, path).select("k").collect()]
        ops = ["append", "dv_delete", "dv_update", "merge", "compact"]
        if partitioned:
            ops.append("delete_where_cdc")
        op = rng.choice(ops)
        if op == "append" or not live:
            rows = _rows_df(spark, fresh(rng.randrange(1, 4)))
            if partitioned:
                S.merge_commit(spark, rows, path, spec)
            else:
                S.commit(spark, rows, path, mode="append")
            done.append("append")
        elif op == "dv_delete":
            k = rng.choice(live)
            S.delete_where_dv(spark, path, f"k = {k}")
            done.append(op)
        elif op == "dv_update":
            k = rng.choice(live)
            S.update_where_dv(spark, path, f"k = {k}", {"amt": "amt + 1000"})
            done.append(op)
        elif op == "merge":
            ups = [(rng.choice(live), rng.randrange(100))] + fresh(1)
            S.merge_commit(
                spark,
                _rows_df(spark, ups),
                path,
                spec,
                change_data=bool(rng.getrandbits(1)),
            )
            done.append(op)
        elif op == "delete_where_cdc":
            k = rng.choice(live)
            S.delete_where(
                spark, path, f"k = {k}",
                change_data=bool(rng.getrandbits(1)),
            )
            done.append(op)
        elif op == "compact":
            S.compact(spark, path)
            done.append(op)
    if not partitioned:
        # terminal rename: the whole feed must come back under the
        # head's LOGICAL name (metadata-only; emits nothing itself)
        S.rename_column(path, "amt", "amount")
        done.append("rename")
    return done


@pytest.mark.parametrize(
    "seed,partitioned",
    [(11, False), (23, False), (37, True), (59, True)],
)
def test_feed_replay_equals_final_table(spark, tmp_path, seed, partitioned):
    rng = random.Random(seed)
    path = str(tmp_path / "t")
    spec = _spec(partitioned)
    program = _apply_random_program(
        spark, rng, path, spec, partitioned, n_ops=6
    )

    feed = table_changes(spark, path).collect()
    state: dict = {}
    for r in sorted(feed, key=lambda r: r._commit_version):
        key = tuple(
            r[c] for c in feed[0].asDict() if not c.startswith("_")
        )
        if r._change_type in ("insert", "update_postimage"):
            state[key] = state.get(key, 0) + 1
        elif r._change_type in ("delete", "update_preimage"):
            state[key] = state.get(key, 0) - 1
        else:  # pragma: no cover - unknown change type is a bug
            raise AssertionError(r._change_type)
    live = sorted(k for k, n in state.items() if n > 0)
    assert all(n in (0, 1) for n in state.values()), (program, state)

    final = S.read(spark, path)
    expect = sorted(tuple(r) for r in final.select(*final.columns).collect())
    assert live == expect, program
