"""Invariant tests for the training-set preparation operators
(`operators/training_prep.py`) and the UDTF surface
(`operators/udtf_ops.py`) — oracle parity is covered by
test_oracle_parity; these pin the semantic properties parity alone
can't (conservation laws, decision consistency, UDTF-vs-relational
agreement)."""

from pyspark.sql import functions as F

from qrapids_forecast_r_script_spark.operators.training_prep import (
    _SEQ_LEN,
    centroid_label_confusion,
    nb_quality_classifier,
    sequence_packing_examples,
)
from qrapids_forecast_r_script_spark.operators.udtf_ops import doc_chunks_udtf
from qrapids_forecast_r_script_spark.sources import load_table


def test_nb_classifier_covers_corpus_and_decision_is_score_sign(
        spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = nb_quality_classifier(spark, sf_dir).collect()
    assert len(out) == docs.count()  # every doc scored exactly once
    for r in out:
        assert r.predicted_target == (r.nb_score > 0)
        assert r.teacher_agrees == (r.predicted_target == (r.lang == "en"))
    # better than coin-flip on the weak-supervision teacher; the
    # synthetic near-uniform vocabulary is only weakly discriminative,
    # so no stronger accuracy claim is pinned (the operator under test
    # is the closed-form training + broadcast scoring SHAPE)
    agree = sum(r.teacher_agrees for r in out) / len(out)
    assert agree >= 0.5, agree


def test_sequence_packing_conserves_tokens_and_fills_examples(
        spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    total_tokens = (docs.select(F.sum(F.size(F.split("text", " ")))
                                .alias("t")).collect()[0].t)
    rows = sequence_packing_examples(spark, sf_dir).collect()
    # conservation: every corpus token lands in exactly one example
    assert sum(r.n_tokens for r in rows) == total_tokens
    # example ids are dense 0..K with no gaps
    ids = sorted(r.example_id for r in rows)
    assert ids == list(range(len(rows)))
    # every example except the final ragged one is exactly full
    short = [r for r in rows if r.n_tokens != _SEQ_LEN]
    assert len(short) <= 1
    if short:
        assert short[0].example_id == ids[-1]
    for r in rows:
        assert r.crosses_boundary == (r.n_docs > 1)
        assert r.first_doc_id <= r.last_doc_id


def test_centroid_confusion_partitions_vectors_and_beats_chance(
        spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    n_vecs = emb.count()
    n_labels = emb.select("label").distinct().count()
    rows = centroid_label_confusion(spark, sf_dir).collect()
    assert sum(r.n_vecs for r in rows) == n_vecs  # exactly one cell/vector
    diag = sum(r.n_vecs for r in rows if r.true_label == r.pred_label)
    # nearest-own-centroid agreement must beat the 1/k chance floor by
    # a wide margin if the embedding space carries label signal at all
    assert diag / n_vecs > 2.0 / n_labels, (diag, n_vecs)
    for r in rows:
        assert -1.0 <= r.avg_cos <= 1.0


def test_udtf_chunks_reassemble_to_original_text(spark, sf_dir):
    docs = {r.doc_id: r.text
            for r in load_table(spark, sf_dir, "documents").collect()}
    out = doc_chunks_udtf(spark, sf_dir).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # non-overlapping 32-token windows concatenate back exactly
        assert " ".join(c.chunk_text for c in chunks) == docs[doc_id]
        assert all(c.n_tokens == 32 for c in chunks[:-1])
        assert 1 <= chunks[-1].n_tokens <= 32
