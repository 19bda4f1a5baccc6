from __future__ import annotations

from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.chunking import (
    chunk_documents,
)


def test_chunk_windows_exact(spark):
    text = " ".join(f"t{i}" for i in range(1, 11))  # t1 .. t10
    df = spark.createDataFrame([(1, text, "a")], ["doc_id", "text", "source"])
    rows = (
        chunk_documents(
            df, chunk_tokens=4, overlap=2, keep_cols=("source",)
        )
        .orderBy("chunk_id")
        .collect()
    )
    # step=2 → starts 0,2,4,6,8
    assert [r.chunk_id for r in rows] == [0, 1, 2, 3, 4]
    assert [r.chunk_text for r in rows] == [
        "t1 t2 t3 t4",
        "t3 t4 t5 t6",
        "t5 t6 t7 t8",
        "t7 t8 t9 t10",
        "t9 t10",
    ]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4, 4, 2]
    assert all(r.source == "a" for r in rows)
    # consecutive full windows share exactly `overlap` tokens
    for a, b in zip(rows, rows[1:]):
        assert a.chunk_text.split()[2:] == b.chunk_text.split()[: len(a.chunk_text.split()[2:])]


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "one two", "a"), (2, "   ", "a")], ["doc_id", "text", "source"]
    )
    rows = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    by_id = {r.doc_id: r for r in rows}
    assert len(rows) == 2  # one window each
    assert by_id[1].chunk_text == "one two"
    assert by_id[1].n_chunk_tokens == 2
    assert by_id[2].chunk_text == ""  # whitespace-only → single empty token


def test_chunk_reconstruction(spark):
    """Dropping each window's first `overlap` tokens (except window 0)
    reconstructs the original document."""
    text = " ".join(f"w{i}" for i in range(57))
    df = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    rows = (
        chunk_documents(df, chunk_tokens=16, overlap=4)
        .orderBy("chunk_id")
        .collect()
    )
    toks: list[str] = []
    for r in rows:
        ts = r.chunk_text.split()
        toks.extend(ts if r.chunk_id == 0 else ts[4:])
    assert toks == text.split()


def test_doc_chunks_plan_is_narrow(spark, sf_dir):
    """Chunking must stay a pure narrow transform — no Exchange anywhere in
    the executed plan, at any scale."""
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans import catalog
    from _lakehouse_architecture_for_e_commerce_transactions_spark.plans.explain import (
        executed_plan_text,
    )

    plan = executed_plan_text(catalog.q_doc_chunks(spark, sf_dir))
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_remove_boilerplate_drops_shared_blocks_keeps_order(spark):
    from _lakehouse_architecture_for_e_commerce_transactions_spark.operators.chunking import (
        remove_boilerplate,
    )

    banner = " ".join(f"b{i}" for i in range(4))  # 4-token shared banner
    rows = [
        (1, banner + " alpha beta gamma delta"),
        (2, banner + " epsilon zeta eta theta"),
        (3, banner + " iota kappa lambda mu"),
        (4, "nu xi omicron pi " + banner),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            df, block_tokens=4, min_docs=3
        ).collect()
    }
    # the banner block (appearing in 4 docs) is gone; unique tails stay
    assert out[1]["clean_text"] == "alpha beta gamma delta"
    assert out[2]["clean_text"] == "epsilon zeta eta theta"
    assert out[1]["n_dropped"] == 1 and out[1]["n_blocks"] == 2
    # doc 4 has the banner as its SECOND block: unique head survives
    assert out[4]["clean_text"] == "nu xi omicron pi"
