"""Document chunking for embedding pipelines — sliding token windows
with overlap, the step between raw documents and the e-family ANN
operators (chunk → embed → index/search).

Chunk rule (closed-form, so the per-doc chunk count has a trivial SQL
oracle): with ``stride = chunk_tokens - overlap``,

    n_chunks = ceil(max(n_tokens - overlap, 1) / stride)

chunk ``i`` covers tokens ``[i*stride, min(i*stride + chunk_tokens,
n_tokens))``. Every document emits at least one chunk (short docs
become one short chunk); consecutive chunks share exactly ``overlap``
tokens except possibly the final short one.

Scale shape: the explode is a ``Generate`` in the projection — zero
shuffle, zero Python; output rows ≈ input tokens / stride. Chunk text
is sliced out JVM-side (``slice`` clamps at the array end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, n_chunk_tokens, chunk_text) —
    one row per sliding window; see module docstring for the rule."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.ceil(F.greatest(n - overlap, F.lit(1)) / F.lit(stride)).cast("int")
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        (F.col("chunk_idx") * stride).cast("int").alias("chunk_start"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
