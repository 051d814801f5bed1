"""Python UDTF surface (SURVEY.md §2.8, Spark 4 extension path).

The engine's declared operators never need a UDTF — every shipped
chunker/scorer is Catalyst expressions (the fast path). This module is
the USER-EXTENSION escape hatch those operators' docstrings point at:
when chunking logic stops being expressible as array slicing
(tokenizer-aware boundaries, sentence splitting, markup-aware
sectioning), a table function is the natural shape — one input row,
many output rows, composable from SQL via LATERAL join.

``ChunkText`` reimplements `text_chunks.chunk_documents`'s exact
layout so the parity test can pin the UDTF path to the expression
path row-for-row; a real extension swaps the body, keeps the schema.

Arrow-optimized (``useArrow=True``): batches cross the Python
boundary columnar, same transfer discipline as the pandas_udf
kernels. Still the slow path relative to the explode — use only for
logic the built-ins cannot express.

Usage (SQL):
    spark.udtf.register("chunk_text", ChunkText)
    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_text(d.text, 32, 24) c
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_idx int, chunk_text string, n_tokens int",
    useArrow=True,
)
class ChunkText:
    """Overlapping token windows of (chunk_size, stride) over one
    document; trailing short window kept — every token in ≥1 chunk
    (the `chunk_documents` contract, text_chunks.py)."""

    def eval(self, text: str, chunk_size: int, stride: int):
        if text is None:
            return
        toks = text.split(" ")
        # one window per start offset 0, stride, 2·stride, … < n —
        # including trailing starts inside an earlier window's span
        # (chunk_documents emits those too)
        for ci, start in enumerate(range(0, len(toks), stride)):
            window = toks[start:start + chunk_size]
            yield ci + 1, " ".join(window), len(window)


def register_udtfs(spark) -> None:
    """Register the extension table functions on a session."""
    spark.udtf.register("chunk_text", ChunkText)
