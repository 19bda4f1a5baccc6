"""Streaming corpus ingestion with online near-dup filtering: per-batch
index probe + atomic snapshot appends, replay-safe."""

from __future__ import annotations

import os

from _lakehouse_architecture_for_e_commerce_transactions_spark.sources import (
    snapshots as S,
)
from _lakehouse_architecture_for_e_commerce_transactions_spark.streaming.corpus import (
    stream_corpus_ingest,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seven wizards "
    "brew distinct potions under a bright autumn moon tonight"
)
OTHER = (
    "colorless green ideas sleep furiously as the orchestra rehearses "
    "twelve entirely different melodies beside the frozen harbor wall"
)


def _write_csv(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("doc_id,text,source\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")


def test_stream_corpus_online_dedup(spark, tmp_path):
    raw = str(tmp_path / "raw")
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    batches = []

    _write_csv(f"{raw}/b1.csv", [(1, BASE, "web"), (2, OTHER, "web")])
    q = stream_corpus_ingest(
        spark, raw, corpus, idx, ckpt,
        on_batch=lambda b, k, d: batches.append((k, d)),
    )
    q.awaitTermination(120)
    assert {r["doc_id"] for r in S.read(spark, corpus).collect()} == {1, 2}

    # batch 2: one near-dup of doc 1, one novel doc
    _write_csv(
        f"{raw}/b2.csv",
        [(10, BASE + " extra", "web"),
         (11, "entirely novel content about deep sea hydrothermal vent "
              "ecosystems and their chemosynthetic bacterial mats", "web")],
    )
    q2 = stream_corpus_ingest(
        spark, raw, corpus, idx, ckpt,
        on_batch=lambda b, k, d: batches.append((k, d)),
    )
    q2.awaitTermination(120)
    kept = {r["doc_id"] for r in S.read(spark, corpus).collect()}
    assert kept == {1, 2, 11}          # 10 dropped as near-dup of 1
    assert batches[-1] == (1, 1)       # 1 kept, 1 dropped
    # corpus and index advanced one version per batch
    assert len(S.history(corpus)) == 2
    assert len(S.history(idx)) == 2


def test_stream_corpus_replay_is_idempotent_by_doc_id(spark, tmp_path):
    """Re-offering an already-committed doc (crash-replay shape) must not
    duplicate it even though the checkpoint is fresh."""
    raw1 = str(tmp_path / "raw1")
    raw2 = str(tmp_path / "raw2")
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")

    _write_csv(f"{raw1}/b1.csv", [(1, BASE, "web")])
    q = stream_corpus_ingest(
        spark, raw1, corpus, idx, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)

    # same doc arrives again via a different stream/checkpoint: the index
    # probe (near-dup of itself) drops it
    _write_csv(f"{raw2}/b1.csv", [(1, BASE, "web"), (2, OTHER, "web")])
    q2 = stream_corpus_ingest(
        spark, raw2, corpus, idx, str(tmp_path / "ck2")
    )
    q2.awaitTermination(120)
    rows = S.read(spark, corpus).collect()
    assert sorted(r["doc_id"] for r in rows) == [1, 2]


LOWQ = "aaaa aaaa aaaa aaaa"  # repetitive junk: fails the quality gate
EVALDOC = BASE  # eval set == BASE text → BASE-like docs are contaminated


def test_stream_continuous_curation_gates(spark, tmp_path):
    """Quality gate rejects junk before hashing; decontamination drops
    eval-overlapping docs after dedup; clean novel docs ingest."""
    raw = str(tmp_path / "raw")
    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.createDataFrame(
        [(900, EVALDOC)], "doc_id long, text string"
    )

    _write_csv(
        f"{raw}/b1.csv",
        [(1, OTHER, "web"), (2, LOWQ, "web"), (3, BASE, "web")],
    )
    q = stream_corpus_ingest(
        spark, raw, corpus, idx, ckpt,
        quality_min=0.3, min_chars=30,
        eval_docs=ev, contamination_max=0.5, contamination_ngram=3,
    )
    q.awaitTermination(120)
    # doc 2 fails quality (repetition + length), doc 3 is contaminated
    # (identical to the eval doc), doc 1 survives
    assert {r["doc_id"] for r in S.read(spark, corpus).collect()} == {1}

    # a near-dup of doc 1 in a later batch still dedups against the
    # index built from gated survivors
    _write_csv(
        f"{raw}/b2.csv",
        [(10, OTHER.replace("frozen", "icy"), "web")],
    )
    q = stream_corpus_ingest(
        spark, raw, corpus, idx, ckpt,
        quality_min=0.3, min_chars=30,
        eval_docs=ev, contamination_max=0.5, contamination_ngram=3,
    )
    q.awaitTermination(120)
    assert {r["doc_id"] for r in S.read(spark, corpus).collect()} == {1}
