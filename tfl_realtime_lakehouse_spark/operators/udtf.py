"""Python UDTF surface (Spark 4 user-defined table functions).

The engine's hot paths are deliberately JVM-side (HOFs / built-ins) or
Arrow-batched (mapInPandas / applyInPandas*); UDTFs complete the UDF
family for the cases users actually reach for them: row-to-many-rows
transforms with per-row Python logic that has no HOF equivalent
(external parsers, tokenizers, format shredders).

``ChunkDocumentsUDTF`` mirrors :func:`operators.text.chunk_documents`
exactly — tested equal — so it doubles as an honest benchmark of the
path NOT taken: the JVM HOF version is the production operator; the
UDTF exists as the API on-ramp for logic that can't be expressed as
expressions. Registration:

    spark.udtf.register("chunk_documents", ChunkDocumentsUDTF)
    spark.sql("SELECT c.* FROM documents, "
              "LATERAL chunk_documents(doc_id, text, 64, 64) c")
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, chunk_id: int, chunk_text: string, n_tokens: int")
class ChunkDocumentsUDTF:
    """Overlapping token-window chunking as a lateral table function.
    Same contract as text.chunk_documents (a doc shorter than one
    window yields exactly one chunk)."""

    def eval(self, doc_id: int, text: str, chunk_tokens: int = 64, stride: int = 48):
        toks = (text or "").split(" ")
        n = len(toks)
        chunk_id = 0
        for start in range(0, max(n, 1), stride):
            if start >= n:
                break
            window = toks[start : start + chunk_tokens]
            yield doc_id, chunk_id, " ".join(window), len(window)
            chunk_id += 1
