"""Partition-level retention (TTL): expire whole partitions by their
partition value — the scale analogue of the reference's row-level
`DELETE FROM ... WHERE DEVICEID=x` landing reset (S6,
STG_Firebase2Oracle.py:99-119).

At 100 TB you never retire data by scanning rows: a `partitionBy(day)`
(or load_key) layout makes retention a METADATA operation — list the
partition directories, drop the ones whose value is past the cutoff.
No read, no shuffle, no rewrite of surviving data; cost is O(expired
partitions), zero touch on the rest. On a lakehouse this is
`ALTER TABLE DROP PARTITION` / Delta `delete` on a partition predicate
that prunes to metadata; locally it is directory removal with the same
crash story (an interrupted run leaves some expired partitions present
— rerun is idempotent; surviving data is never at risk because it is
never touched).
"""

from __future__ import annotations

import os
import shutil

from collections.abc import Callable


def list_partitions(path: str, partition_col: str) -> list[tuple[str, str]]:
    """[(value, dir)] for a hive-layout `col=value` partitioned table."""
    prefix = f"{partition_col}="
    out = []
    for d in sorted(os.listdir(path)):
        if d.startswith(prefix) and os.path.isdir(os.path.join(path, d)):
            out.append((d[len(prefix):], os.path.join(path, d)))
    return out


def expire_partitions(path: str, partition_col: str,
                      should_expire: Callable[[str], bool]) -> list[str]:
    """Drop every partition whose VALUE the predicate marks expired.
    Returns the expired values. Idempotent: a re-run after a crash
    finishes the job; surviving partitions are never opened."""
    expired = []
    for value, pdir in list_partitions(path, partition_col):
        if should_expire(value):
            shutil.rmtree(pdir)
            expired.append(value)
    return expired


def expire_before(path: str, partition_col: str, cutoff: str) -> list[str]:
    """Retention by lexicographic cutoff — correct for zero-padded date
    (yyyy-MM-dd) and fixed-width numeric partition values."""
    return expire_partitions(path, partition_col, lambda v: v < cutoff)
