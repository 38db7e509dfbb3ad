"""Manifest transaction log: atomic multi-bucket SCD2 commits,
snapshot isolation / time travel, crash safety, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dht11_data_pipeline_spark.operators import txlog
from dht11_data_pipeline_spark.operators.scd2 import apply_scd2
from tests.test_scd2 import B1, B2, CFG, _df, _empty_target


@pytest.fixture()
def logged(spark, tmp_path):
    table = str(tmp_path / "hist_logged")
    t1 = apply_scd2(_df(spark, B1), _empty_target(spark), CFG,
                    load_ts="2024-05-05 12:00:00", deterministic_keys=True)
    v = txlog.init_table(t1, table, CFG, n_buckets=16)
    assert v == 1
    return table, t1


def test_logged_apply_matches_plain(spark, logged):
    table, t1 = logged
    batch = _df(spark, [B2[1], B2[3]])  # one U + one I
    v = txlog.apply_scd2_logged(spark, batch, table, CFG,
                                load_ts="2024-05-06 12:00:00",
                                deterministic_keys=True)
    assert v == 2
    got = txlog.read_table(spark, table)
    want = apply_scd2(batch, t1, CFG, load_ts="2024-05-06 12:00:00",
                      deterministic_keys=True, incremental=True)
    cols = want.columns
    assert ({tuple(r) for r in got.select(*cols).collect()}
            == {tuple(r) for r in want.select(*cols).collect()})


def test_time_travel_and_snapshot_stability(spark, logged):
    table, t1 = logged
    old_snapshot = txlog.read_table(spark, table)  # resolved at v1
    batch = _df(spark, [B2[1], B2[3]])
    txlog.apply_scd2_logged(spark, batch, table, CFG,
                            load_ts="2024-05-06 12:00:00",
                            deterministic_keys=True)
    # v1 readable by version pin AND via the pre-commit DataFrame
    # (files are immutable — no swap_target FILE_NOT_EXIST hazard)
    assert txlog.read_table(spark, table, version=1).count() == 4
    assert old_snapshot.count() == 4
    assert txlog.read_table(spark, table).count() == 6  # 4 + closed + new


def test_nc_only_batch_commits_nothing(spark, logged):
    table, _ = logged
    nc = _df(spark, [B1[0]])
    v = txlog.apply_scd2_logged(spark, nc, table, CFG,
                                load_ts="2024-05-07 12:00:00",
                                deterministic_keys=True)
    assert v == 1 and txlog.current_version(table) == 1


def test_unchanged_buckets_keep_their_dirs(spark, logged):
    table, _ = logged
    before = txlog.read_manifest(table)["buckets"]
    batch = _df(spark, [B2[3]])  # single new key
    txlog.apply_scd2_logged(spark, batch, table, CFG,
                            load_ts="2024-05-06 12:00:00",
                            deterministic_keys=True)
    after = txlog.read_manifest(table)["buckets"]
    changed = {b for b in after if after[b] != before.get(b)}
    assert len(changed) == 1
    for b, path in before.items():
        if b not in changed:
            assert after[b] == path


def test_crash_before_manifest_is_invisible(spark, logged):
    table, _ = logged
    # simulate: data files written for a commit but manifest never
    # published (crash between write and rename)
    orphan = os.path.join(table, "data", "commit-99999999")
    _df(spark, [B2[3]]).write.mode("overwrite").parquet(orphan)
    assert txlog.current_version(table) == 1
    assert txlog.read_table(spark, table).count() == 4
    removed = txlog.vacuum(table, retain_versions=2)
    assert "data/commit-99999999" in removed


def test_crash_between_tmp_manifest_and_publish(spark, logged):
    """Torn commit one step later than the data-only crash: the tmp
    manifest was written and fsynced but the atomic os.link never ran.
    The stale .tmp must be invisible to version resolution and readers,
    must not block the NEXT committer from taking that version number,
    and vacuum must leave every file of the surviving manifests."""
    table, _ = logged
    # orphaned data + a fully-written tmp manifest for would-be v2
    orphan = os.path.join(table, "data", "commit-00000002-dead-0")
    _df(spark, [B2[3]]).write.mode("overwrite").parquet(orphan)
    m = txlog.read_manifest(table)
    import json
    tmp = os.path.join(table, "_txlog", "v00000002.json.tmp.99999")
    with open(tmp, "w") as fh:
        json.dump({**m, "version": 2,
                   "buckets": {"0": "data/commit-00000002-dead-0"}}, fh)
    # reader sees v1 only; the torn artifacts are invisible
    assert txlog.current_version(table) == 1
    assert txlog.read_table(spark, table).count() == 4
    # the next real committer claims v2 without conflict
    v = txlog.apply_scd2_logged(spark, _df(spark, [B2[1]]), table, CFG,
                                load_ts="2024-05-06 12:00:00",
                                deterministic_keys=True)
    assert v == 2
    assert txlog.read_table(spark, table).count() == 5
    # vacuum collects the orphan dir but keeps every live manifest file
    removed = txlog.vacuum(table, retain_versions=2)
    assert "data/commit-00000002-dead-0" in removed
    assert txlog.read_table(spark, table, version=1).count() == 4
    assert txlog.read_table(spark, table, version=2).count() == 5


def test_vacuum_retains_recent_versions(spark, logged):
    table, _ = logged
    txlog.apply_scd2_logged(spark, _df(spark, [B2[1]]), table, CFG,
                            load_ts="2024-05-06 12:00:00",
                            deterministic_keys=True)
    txlog.apply_scd2_logged(spark, _df(spark, [B2[3]]), table, CFG,
                            load_ts="2024-05-07 12:00:00",
                            deterministic_keys=True)
    assert txlog.current_version(table) == 3
    removed = txlog.vacuum(table, retain_versions=2)
    # v1 manifest dropped; latest two versions still fully readable
    assert any(r.startswith("_txlog/v00000001") for r in removed)
    # v2: 4 originals with one closed out + its new version = 5
    assert txlog.read_table(spark, table, version=2).count() == 5
    # v3: + one brand-new key
    assert txlog.read_table(spark, table, version=3).count() == 6
    with pytest.raises(FileNotFoundError):
        txlog.read_manifest(table, 1)


def test_concurrent_commit_detected(spark, logged, monkeypatch):
    table, _ = logged
    m = txlog.read_manifest(table)
    txlog._commit(table, {"n_buckets": m["n_buckets"],
                          "buckets": m["buckets"]})  # v2 committed
    # a racer that read the log BEFORE v2 landed tries to claim v2 too:
    # simulate its stale view of the latest version
    monkeypatch.setattr(txlog, "current_version", lambda d: 1)
    with pytest.raises(RuntimeError, match="concurrent commit"):
        txlog._commit(table, {"n_buckets": m["n_buckets"],
                              "buckets": m["buckets"]})


def test_change_feed_between_versions(spark, logged):
    table, _ = logged
    batch = _df(spark, [B2[1], B2[3]])  # one U + one I
    txlog.apply_scd2_logged(spark, batch, table, CFG,
                            load_ts="2024-05-06 12:00:00",
                            deterministic_keys=True)
    feed = txlog.change_feed(spark, table, from_version=1).collect()
    by_type = {}
    for r in feed:
        by_type.setdefault(r["_change_type"], []).append(r)
    # U: old current row deleted, replaced by its closed 'N' twin,
    # plus the new 'Y' version; I: one new 'Y' row
    assert len(by_type.get("delete", [])) == 1
    d = by_type["delete"][0]
    assert d["humidity"] == "62" and d["da_current_flag"] == "Y"
    ins = by_type["insert"]
    assert len(ins) == 3
    flags = sorted((r["humidity"], r["da_current_flag"]) for r in ins)
    assert flags == [("62", "N"), ("70", "Y"), ("99", "Y")]


def test_change_feed_empty_when_no_changes(spark, logged):
    table, _ = logged
    feed = txlog.change_feed(spark, table, from_version=1, to_version=1)
    assert feed.count() == 0
    assert "_change_type" in feed.columns


def test_multi_batch_fold_matches_plain_apply(spark, logged):
    """Four sequential batches through the log equal the plain
    apply_scd2 fold over the same batches, and per-step change feeds
    compose to the end-to-end diff."""
    table, state = logged
    batches = [
        [B2[1]],                 # U
        [B2[3]],                 # I
        [B2[1], B2[3]],          # NC + NC (replay shape)
        [("D1", "2024-05-05 11:30:35", "IST", "77", "29", 9),  # U again
         ("D4", "2024-05-07 09:00:00", "UTC", "40", "15", 9)], # new I
    ]
    ts = ["2024-05-06 12:00:00", "2024-05-07 12:00:00",
          "2024-05-08 12:00:00", "2024-05-09 12:00:00"]
    versions = [1]
    for rows, load_ts in zip(batches, ts):
        b = _df(spark, rows)
        txlog.apply_scd2_logged(spark, b, table, CFG, load_ts=load_ts,
                                deterministic_keys=True)
        versions.append(txlog.current_version(table))
        state = apply_scd2(b, state, CFG, load_ts=load_ts,
                           deterministic_keys=True, incremental=True)
    # NC-only batch minted no version
    assert versions == [1, 2, 3, 3, 4]
    got = {tuple(r) for r in
           txlog.read_table(spark, table).select(*state.columns).collect()}
    want = {tuple(r) for r in state.collect()}
    assert got == want

    # change feeds compose: folding per-step feeds onto v1 yields v4
    start = {tuple(r) for r in
             txlog.read_table(spark, table, version=1)
             .select(*state.columns).collect()}
    acc = set(start)
    for a, b in zip(versions[:-1], versions[1:]):
        if a == b:
            continue
        feed = txlog.change_feed(spark, table, a, b)
        dels = {tuple(r) for r in
                feed.filter(F.col("_change_type") == "delete")
                .select(*state.columns).collect()}
        ins = {tuple(r) for r in
               feed.filter(F.col("_change_type") == "insert")
               .select(*state.columns).collect()}
        assert dels <= acc
        acc = (acc - dels) | ins
    assert acc == want
