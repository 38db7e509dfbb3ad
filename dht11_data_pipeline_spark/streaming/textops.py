"""Streaming text-quality gates: the textops audits whose corpus-wide
inputs can be DECLARED become stateless per-row annotators on a
document stream (the weighted_keep_stream / cluster_balanced_stream
move — a periodic batch pass refreshes the declared artifact, the
stream applies it).

``oov_rate`` is the first: its only corpus-wide input is the top-V
vocabulary, which every real tokenizer deployment ships as a frozen
artifact anyway. Given that list, the per-doc token/OOV counts are a
pure projection — no state store, no watermark, identical output for
a batch frame and a stream fed the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def oov_rate_stream(df: DataFrame, vocab: list[str],
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document OOV audit against a DECLARED vocabulary.

    Matches ``operators/textops.oov_rate`` row for row when ``vocab``
    is the batch pass's own top-V list (pinned in
    tests/test_streaming_curation.py). Docs with zero tokens are
    dropped (no rate is defined), mirroring the batch operator's
    absent-row behavior. The vocabulary rides the task closure as an
    array literal — top-V lists are small by construction (the batch
    side cuts them with the distributed ranking operator precisely
    because the TYPE frame is huge, the chosen vocab is not).

    Works identically on streaming and batch frames (pure projection).
    """
    if not vocab:
        raise ValueError("oov_rate_stream: need a non-empty declared "
                         "vocabulary")
    vocab_arr = F.array(*[F.lit(t) for t in sorted(set(vocab))])
    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    oov = F.filter(toks, lambda t: ~F.array_contains(vocab_arr, t))
    staged = (df.select(F.col(id_col),
                        F.size(toks).cast("bigint").alias("n_tokens"),
                        F.size(oov).cast("bigint").alias("n_oov"))
              .filter(F.col("n_tokens") >= 1))
    return staged.select(
        id_col, "n_tokens", "n_oov",
        F.expr("(1000000 * n_oov) DIV n_tokens")
        .cast("bigint").alias("oov_ppm"))
