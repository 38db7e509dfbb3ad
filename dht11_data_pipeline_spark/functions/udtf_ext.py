"""User-defined table function (UDTF) extension seam — the escape
hatch for per-row 1:N logic that genuinely cannot be expressed with
built-in generators (explode/posexplode/inline/stack).

Policy reminder (SURVEY §2.10): UDTFs are row-at-a-time Python — the
SLOW path. Every shipped operator uses built-ins (see
operators/curation.chunk_tokens for the codegen'd chunker this module
mirrors); this module exists so a user extending the engine has a
tested template for the cases built-ins can't cover (stateful per-row
expansion, external-library tokenizers, recursive descent parsing).

``ChunkTokens`` deliberately reimplements chunk_tokens' contract so
tests can assert bit-identical parity between the UDTF path and the
built-in path — proving the template produces engine-consistent
results before a user swaps in their real logic.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_chunk_tokens int, chunk_hash string")
class ChunkTokens:
    """Overlapping token-window chunks of one document's text.
    Row-at-a-time equivalent of operators/curation.chunk_tokens
    (chunk i covers tokens [i*stride, i*stride+chunk_size); final
    chunk may be short; 16-hex-char sha256 of the space-joined chunk).
    """

    def eval(self, text: str, chunk_size: int, stride: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for idx, start in enumerate(range(0, len(toks), stride)):
            chunk = toks[start:start + chunk_size]
            joined = " ".join(chunk)
            h = hashlib.sha256(joined.encode()).hexdigest()[:16]
            yield idx, len(chunk), h


def chunk_tokens_udtf(spark, df, chunk_size: int = 32, stride: int = 24,
                      text_col: str = "text", id_col: str = "doc_id"):
    """Lateral-join the UDTF against each document row — the plan shape
    is a Python-evaluated Generate (visible as BatchEvalPythonUDTF in
    explain), where the built-in version is a codegen'd Generate."""
    spark.udtf.register("chunk_tokens_udtf", ChunkTokens)
    df.createOrReplaceTempView("_udtf_docs")
    return spark.sql(f"""
        SELECT d.{id_col}, c.chunk_idx, c.n_chunk_tokens, c.chunk_hash
        FROM _udtf_docs d,
             LATERAL chunk_tokens_udtf(d.{text_col}, {int(chunk_size)},
                                       {int(stride)}) c
    """)


__all__ = ["ChunkTokens", "chunk_tokens_udtf"]
