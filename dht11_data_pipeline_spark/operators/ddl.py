"""DDL-shaped helpers: truncate / idempotent drop / CTAS-materialize.

Reference parity for the table-lifecycle operators SURVEY §2.1 lists:

- S7 ``truncate_table`` (Delta_detection_query_gen.py:104-112): empty a
  table in place, schema preserved — here an overwrite of an empty
  frame with the same schema (atomic: parquet commit protocol swaps the
  directory contents on success).
- S8 ``drop_table_if_exists`` (Delta_detection_query_gen.py:114-138):
  the reference wraps DROP in a PL/SQL block swallowing ORA-942; on
  Spark idempotent drop is built in (``DROP TABLE IF EXISTS`` /
  recursive path delete that tolerates absence).
- S9 ``materialize`` (CTAS temp table, Delta_detection_query_gen.py:
  140-155): the reference spills the delta join to a temp table reused
  by MERGE and INSERT. Spark-native that's ``.persist()`` (memory,
  spill-to-disk automatic) for within-job reuse, or an actual parquet
  write for cross-job reuse — ``spill=True`` picks the latter, which is
  also the right call when the intermediate exceeds cluster memory.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.utils import AnalysisException


def truncate_table(spark: SparkSession, path: str) -> None:
    """S7: empty the parquet table at ``path`` keeping its schema."""
    try:
        schema = spark.read.parquet(path).schema
    except AnalysisException:
        return  # nothing to truncate — match the reference's silent no-op
    spark.createDataFrame([], schema).write.mode("overwrite").parquet(path)


def drop_table_if_exists(spark: SparkSession, path: str) -> bool:
    """S8: remove the table directory; True if it existed. Never raises
    on absence (the ORA-942-swallowing semantics, minus the PL/SQL)."""
    try:
        shutil.rmtree(path)
        return True
    except FileNotFoundError:
        return False


def materialize(df: DataFrame, path: str | None = None,
                spill: bool = False) -> DataFrame:
    """S9: CTAS-parity materialization of an intermediate result that
    downstream phases read more than once (the SCD2 delta feeds both
    the close-out and the insert pass).

    ``spill=False``: persist (lazy; first action populates the cache).
    ``spill=True``: write to ``path`` and return the re-read frame —
    cuts lineage entirely and survives executor loss, at the price of
    one full write."""
    if spill:
        if not path:
            raise ValueError("spill=True requires a path")
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)
    return df.persist()
