"""Exactly-once streaming sink into a JDBC database — the streaming
completion of the reference's Oracle write path (STG_Firebase2Oracle.py
:75-89 row-at-a-time INSERT loop; SURVEY §2.1 S5/S6).

``foreachBatch`` gives at-least-once batch delivery: after a crash the
same (batch_id, rows) pair replays. Exactly-once therefore needs the
write itself to be idempotent. The standard transactional-outbox shape:

1. every row is stamped with its ``batch_id``,
2. the batch commit first DELETEs any rows already carrying this
   batch_id (a replay leftover from a partial commit), then
3. appends the batch via the partitioned ``spark.write.jdbc`` path.

Delete-then-insert per batch_id is what Delta's
``txnAppId``/``txnVersion`` and Kafka's transactional producer encode
with less SQL — replayed batches converge to exactly one copy with no
reliance on a transaction spanning executors.

At scale the DELETE probes an index on batch_id (O(replayed rows),
zero on the non-crash path) and the INSERT fans out over executors —
versus the reference's single-connection per-row loop.

The whole path runs live against embedded Derby (bundled with Spark)
in tests/test_streaming_jdbc_sink.py, including a forced replay.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BATCH_COL = "sink_batch_id"


def _delete_batch(spark, url: str, table: str, driver: str,
                  batch_id: int) -> None:
    """Remove a partially-committed replay's rows. Uses the JVM's
    DriverManager directly — same classloader Spark's JDBC source uses,
    no extra dependency."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.executeUpdate(
                f'DELETE FROM {table} WHERE "{BATCH_COL}" = {int(batch_id)}')
        finally:
            st.close()
    finally:
        conn.close()


def jdbc_batch_writer(url: str, table: str,
                      driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
                      ) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function writing each micro-batch to
    ``table`` exactly once under replays."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        stamped = batch_df.withColumn(
            BATCH_COL, F.lit(int(batch_id)).cast("long"))
        spark = batch_df.sparkSession
        props = {"driver": driver}
        # first batch ever: let spark.write.jdbc create the table.
        # ONLY a genuine table-not-found may skip the anti-replay
        # DELETE — treating a transient JDBC failure (connection
        # refused, lock timeout) as "missing table" would re-append a
        # replayed batch and silently break exactly-once, so anything
        # else propagates and the batch retries.
        exists = True
        try:
            spark.read.jdbc(url, table, properties=props).schema
        except Exception as exc:  # noqa: BLE001 - filtered below
            msg = str(exc).lower()
            if not any(p in msg for p in (
                    "does not exist",       # Derby 42X05
                    "not found",            # Postgres/MySQL phrasing
                    "table_or_view_not_found")):
                raise
            exists = False
        if exists:
            _delete_batch(spark, url, table, driver, batch_id)
        stamped.write.jdbc(url, table, mode="append", properties=props)

    return _write
