"""Local mirror of the driver's DuckDB differential compare:
row-count + column-name set + order-insensitive canonical value hash.
Used by test_queries_duckdb.py and runnable standalone:

    python tests/diffcheck.py [sf_dir]

Every standalone run also records its per-key verdicts to
``tests/verdicts/<sf_name>.json`` so the cross-SF correctness claim in
SCALING.md is backed by a machine-written artifact, not prose
(round-5 verdict item 9: per-SF correctness existed only as claims,
and exactly such a claim was falsified at the canonicalization layer).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math
import sys

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def _canon(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip shortest repr; normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v)) + ".0"
        return repr(v)
    if isinstance(v, _dec.Decimal):
        return _canon(float(v))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), h


def duckdb_run(sf_dir: str, sql: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def spark_run(spark, fn, sf_dir: str) -> tuple[list[str], list[tuple]]:
    df = fn(spark, sf_dir)
    return df.columns, [tuple(r) for r in df.collect()]


def compare_one(spark, name: str, fn, sql: str, sf_dir: str) -> list[str]:
    problems: list[str] = []
    # The driver canonicalizes via pandas sort_values, which cannot hash
    # list/map/struct cells — our tolerant _canon hid that once
    # (text_inverted_postings, round 3). Fail loudly on complex outputs.
    df = fn(spark, sf_dir)
    complex_cols = [
        (c, t) for c, t in df.dtypes
        if t.startswith(("array", "map", "struct"))
    ]
    if complex_cols:
        return [f"{name}: complex-typed output columns (driver-unsafe): {complex_cols}"]
    s_cols, s_rows = spark_run(spark, fn, sf_dir)
    d_cols, d_rows = duckdb_run(sf_dir, sql)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    sn, sh = canonical_hash(s_cols, s_rows)
    dn, dh = canonical_hash(d_cols, d_rows)
    if sn != dn:
        problems.append(f"{name}: rowcount spark={sn} duck={dn}")
    if sh != dh:
        problems.append(f"{name}: value-hash mismatch (rows={sn})")
        sset = {"\x1f".join(_canon(v) for v in r) for r in s_rows}
        dset = {"\x1f".join(_canon(v) for v in r) for r in d_rows}
        for x in sorted(sset - dset)[:3]:
            problems.append(f"  spark-only: {x[:300]!r}")
        for x in sorted(dset - sset)[:3]:
            problems.append(f"  duck-only:  {x[:300]!r}")
    return problems


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    import json
    import os

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from dht11_data_pipeline_spark.session import get_spark

    spark = get_spark("diffcheck")
    qs, oracles = E.queries(), E.oracle_sql()
    failures = 0
    verdicts: dict[str, dict] = {}
    for name, fn in qs.items():
        if name not in oracles:
            print(f"SKIP (no oracle): {name}")
            verdicts[name] = {"ok": None, "problems": ["no oracle"]}
            continue
        try:
            probs = compare_one(spark, name, fn, oracles[name], sf_dir)
        except Exception as exc:  # noqa: BLE001
            probs = [f"{name}: EXCEPTION {type(exc).__name__}: {exc}"]
        verdicts[name] = {"ok": not probs, "problems": probs}
        if probs:
            failures += 1
            print("FAIL", *probs, sep="\n  ")
        else:
            print(f"OK   {name}")
    print(f"\n{len(qs) - failures}/{len(qs)} queries match at {sf_dir}")
    vdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "verdicts")
    os.makedirs(vdir, exist_ok=True)
    sf_name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    with open(os.path.join(vdir, f"{sf_name}.json"), "w") as fh:
        json.dump(verdicts, fh, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
