"""Text primitives for the LLM-data-pipeline operators — all built-in
column expressions (whole-stage codegen; zero Python UDFs).

Tokenization is single-space split (the synthetic corpus is
space-joined); shingling and hashing are higher-order functions over
the token array, so no explode is needed until an operator genuinely
requires row fan-out (e.g. inverted-index joins for Jaccard).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deliberately tiny marker profiles per language for the heuristic
# lang-id scorer; generic mechanism, swap profiles for real corpora.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "fast", "slow"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "vite"],
    "es": ["el", "la", "y", "datos"],
    "zh": ["shuju", "kuai", "man", "biao"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on"]


def tokens(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-grams as an array column: zip_with over offset slices of
    the token array — no explode, no shuffle.

    Deliberately NOT transform(sequence, i -> element_at(tok, i)):
    higher-order functions are interpreted (no codegen), and there each
    element_at re-evaluates the whole ``tok`` child expression — O(len²)
    splits per document; measured 6x slower at sf0.1. zip_with walks
    the three pre-sliced arrays once."""
    if n < 2:
        raise ValueError(f"unsupported shingle width {n}")
    m = F.size(tok) - (n - 1)  # shingle count
    # right-fold of zip_with over the n offset slices: slice i carries
    # word i of every shingle; n-1 zip_withs, each walking pre-sliced
    # arrays once — O(n·len), never the O(len²) element_at trap
    joined = F.slice(tok, n, m)
    for i in range(n - 1, 0, -1):
        joined = F.zip_with(F.slice(tok, i, m), joined,
                            lambda a, b: F.concat_ws(" ", a, b))
    # guard: negative slice lengths error for docs shorter than n tokens
    return F.when(
        F.size(tok) < n, F.array().cast("array<string>")
    ).otherwise(joined)


def distinct_shingles(col: str | Column = "text", n: int = 3) -> Column:
    return F.array_distinct(shingles(tokens(col), n))


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def stopword_count(col: str | Column = "text") -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stop, t)))


def punct_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def marker_score(col: str | Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(arr, t)))
