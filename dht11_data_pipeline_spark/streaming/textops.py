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


def bpe_encode_stream(df: DataFrame, rules: list[tuple[str, str]],
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document BPE symbol statistics under a DECLARED merge-rule
    list — the streaming form of ``operators/textops.bpe_encode``:
    a deployment freezes the tokenizer artifact (the k merges a batch
    ``bpe_vocab`` pass learned) and every arriving document is encoded
    against it with NO aggregation, NO join and NO state. The batch
    operator amortizes the merge chain per DISTINCT word (vocabulary-
    sized work broadcast onto the corpus); a stream has no vocabulary
    frame, so here the chain applies per token occurrence inside a
    higher-order transform — pure per-row work, the declared-artifact
    trade every *_stream twin in this package makes. Row-for-row equal
    to the batch operator fed the same rules (pinned in
    tests/test_streaming_curation.py); docs with zero non-empty tokens
    are dropped, mirroring the batch form's inner-join absence.

    Returns (id, n_tokens, n_chars, n_symbols, compression_ppm).
    """
    if not rules:
        raise ValueError("bpe_encode_stream: need a non-empty declared "
                         "merge-rule list (run bpe_vocab batch-side and "
                         "ship its merges)")

    def _n_syms(word):
        syms = F.concat(F.lit(" "), F.regexp_replace(word, "(.)", "$1 "))
        for pair, merged in rules:
            syms = F.replace(syms, F.lit(f" {pair} "),
                             F.lit(f" {merged} "))
        return F.size(F.split(F.trim(syms), " ")).cast("bigint")

    toks = F.expr(f"filter(split({text_col}, ' '), t -> t != '')")
    zero = F.lit(0).cast("bigint")
    n_chars = F.aggregate(toks, zero,
                          lambda acc, w: acc + F.length(w).cast("bigint"))
    n_syms = F.aggregate(toks, zero, lambda acc, w: acc + _n_syms(w))
    staged = (df.select(F.col(id_col),
                        F.size(toks).cast("int").alias("n_tokens"),
                        n_chars.alias("n_chars"),
                        n_syms.alias("n_symbols"))
              .filter(F.col("n_tokens") >= 1))
    return staged.select(
        id_col, "n_tokens", "n_chars", "n_symbols",
        F.when(F.col("n_chars") == 0, F.lit(1_000_000))
        .otherwise(F.expr("n_symbols * 1000000 DIV n_chars"))
        .cast("bigint").alias("compression_ppm"))
