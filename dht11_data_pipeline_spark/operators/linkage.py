"""Entity resolution: blocked fuzzy (edit-distance) joins.

The classic record-linkage shape — exact match on a cheap BLOCKING key
bounds the candidate set to sum(|block|^2), then an edit-distance
verify keeps true near-matches. All-pairs string comparison is the
canonical scale-killer (N^2 levenshtein calls); blocking makes the
fuzzy join feasible at 100 TB exactly the way LSH banding does for
document dedup — same pattern, lexical tier.

Physical notes:
- the block join is a plain equi-join: one shuffle per side on the
  block key (or zero with co-bucketed tables). Block-size skew is the
  hazard — pick selective keys, or compose (key, first-char) style
  multi-blocks exactly like salting a hot aggregate.
- ``levenshtein`` is a JVM built-in (whole-stage codegen). A length
  pre-filter (|len(a)-len(b)| <= max_dist, a lower bound on edit
  distance) discards most candidates before the O(len^2) DP runs —
  a pure optimization with zero effect on results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(df: DataFrame, block_cols: list[str],
                        text_col: str, id_col: str,
                        max_dist: int = 2) -> DataFrame:
    """Self entity-resolution: unordered pairs (id_a < id_b) agreeing
    on every blocking column with edit_distance(text) <= max_dist.
    Output grades matches: 'exact' (0) vs 'near' (1..max_dist)."""
    a = df.select(*block_cols, F.col(id_col).alias("id_a"),
                  F.col(text_col).alias("text_a"))
    b = df.select(*block_cols, F.col(id_col).alias("id_b"),
                  F.col(text_col).alias("text_b"))
    return (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("text_a") - F.length("text_b")) <= max_dist)
        .withColumn("dist", F.levenshtein("text_a", "text_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            *block_cols, "id_a", "id_b", "text_a", "text_b",
            F.col("dist").cast("int").alias("dist"),
            F.when(F.col("dist") == 0, "exact").otherwise("near")
            .alias("match_grade"),
        )
    )


def blocked_fuzzy_join(left: DataFrame, right: DataFrame,
                       block_cols: list[str], left_text: str,
                       right_text: str, left_id: str, right_id: str,
                       max_dist: int = 2) -> DataFrame:
    """Two-table variant: link every left row to the right rows in its
    block within ``max_dist`` edits (deduplication's sibling: linkage
    across sources)."""
    a = left.select(*block_cols, F.col(left_id).alias("left_id"),
                    F.col(left_text).alias("left_text"))
    b = right.select(*block_cols, F.col(right_id).alias("right_id"),
                     F.col(right_text).alias("right_text"))
    return (
        a.join(b, block_cols)
        .filter(F.abs(F.length("left_text") - F.length("right_text"))
                <= max_dist)
        .withColumn("dist", F.levenshtein("left_text", "right_text"))
        .filter(F.col("dist") <= max_dist)
        .select(*block_cols, "left_id", "right_id", "left_text",
                "right_text", F.col("dist").cast("int").alias("dist"))
    )
