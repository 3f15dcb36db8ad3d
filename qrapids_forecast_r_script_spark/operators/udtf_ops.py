"""Python UDTF surface — the Spark 4 user-defined TABLE function API
(`pyspark.sql.functions.udtf`), exercised as a LATERAL row expander.

Completes the engine's Python-extension API coverage next to the Data
Source reader (`sources/pyds.py::python_datasource_scan`) and writer
(`python_datasource_sink_roundtrip`): scan, sink, and now table
function.  The reference R service has no comparable surface (its only
row expansion is the forecast horizon, TimeSeriesFunctions_GPL_0.5.1.R:
104-124); this is engine-surface parity per SURVEY §2B.

The demo UDTF cuts each document into fixed 32-token NON-overlapping
chunks (the ingestion primitive `text.doc_chunks` implements
relationally with 64/8 overlapping windows) so the oracle is exact SQL
and the relational twin documents the fast path.

Budget note (PLANS.md): a UDTF is a Python operator — the plan carries
a BatchEvalPythonUDTF node.  It is deliberately OUTSIDE the zero-
Python-ops budget of the relational layer: this module demonstrates the
ESCAPE HATCH for logic Catalyst genuinely cannot express (per-row
generators with imperative state), not a hot-path pattern.  At 100 TB
the chunker itself would run as the relational `doc_chunks` form; a
real UDTF workload (e.g. a tokenizer binding) is embarrassingly
parallel — one Python worker per partition, no shuffle introduced by
the LATERAL itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

_CHUNK = 32


class _ChunkDocUDTF:
    """Yield (doc_id, chunk_idx, chunk_text, n_tokens) per 32-token
    non-overlapping window.  Split on single spaces — identical token
    boundaries to `F.split(text, ' ')` and DuckDB `string_split`,
    including empty tokens from consecutive/leading separators."""

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF protocol
        toks = (text or "").split(" ")
        for idx, start in enumerate(range(0, len(toks), _CHUNK)):
            window = toks[start:start + _CHUNK]
            yield doc_id, idx, " ".join(window), len(window)


def doc_chunks_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-overlapping 32-token chunking via a registered Python UDTF in
    a LATERAL join — one output row per chunk, streamed from the
    generator without materializing per-doc chunk arrays."""
    from ..sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("udtf_docs_src")
    spark.udtf.register(
        "chunk_doc",
        udtf(_ChunkDocUDTF,
             returnType=("doc_id bigint, chunk_idx int, "
                         "chunk_text string, n_tokens int")))
    return spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        "FROM udtf_docs_src, LATERAL chunk_doc(doc_id, text) c")


QUERIES = {
    "doc_chunks_udtf": doc_chunks_udtf,
}

ORACLES = {
    # 1-based list_slice; len(string_split) ≥ 1 always (empty text is
    # the single token ''), so every doc emits at least one chunk —
    # matching Python "".split(" ") == [""].
    "doc_chunks_udtf": f"""
        WITH base AS (
            SELECT doc_id, string_split(text, ' ') AS s FROM documents
        ), ch AS (
            SELECT doc_id, s,
                   unnest(generate_series(0, (len(s) - 1) // {_CHUNK}))
                       AS k
            FROM base
        )
        SELECT doc_id,
               CAST(k AS INTEGER) AS chunk_idx,
               array_to_string(
                   list_slice(s, k * {_CHUNK} + 1,
                              least(len(s), (k + 1) * {_CHUNK})),
                   ' ') AS chunk_text,
               CAST(least(len(s), (k + 1) * {_CHUNK}) - k * {_CHUNK}
                    AS INTEGER) AS n_tokens
        FROM ch
    """,
}
