"""Streamed incremental triangle maintenance == batch recompute over
the union of all streamed edges, and a replayed batch folds to the
same state (idempotent)."""

from __future__ import annotations

import json
import os

from dht11_data_pipeline_spark.operators.graph import triangle_counts
from dht11_data_pipeline_spark.streaming.graph import (
    current_triangle_counts,
    start_triangle_stream,
)

# three batches engineered so triangles close ACROSS batches: the
# 4-clique arrives one edge-group per batch, 5-6-7 closes in batch 3,
# batch 2 redelivers a batch-1 edge and a reversed duplicate
BATCHES = [
    [(1, 2), (1, 3), (2, 3), (5, 6)],
    [(1, 4), (2, 4), (2, 1), (6, 7)],
    [(3, 4), (5, 7), (8, 9), (9, 8)],
]


def _write_feed(src: str) -> None:
    os.makedirs(src)
    for b, edges in enumerate(BATCHES):
        path = os.path.join(src, f"b{b}.json")
        with open(path, "w") as f:
            for a, bb in edges:
                f.write(json.dumps({"id_a": a, "id_b": bb}) + "\n")
        os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))


def _all_edges(spark):
    rows = [e for batch in BATCHES for e in batch]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_streaming_triangles_equal_batch(spark, tmp_path):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = str(tmp_path / "feed")
        _write_feed(src)
        q = start_triangle_stream(
            spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"))
        q.awaitTermination(300)
        # one fold per batch actually ran
        parts = os.listdir(str(tmp_path / "state" / "counts"))
        assert sorted(parts) == ["b0", "b1", "b2"]
        got = {r["node"]: r["n_triangles"]
               for r in current_triangle_counts(
                   spark, str(tmp_path / "state")).collect()}
        want = {r["node"]: r["n_triangles"]
                for r in triangle_counts(_all_edges(spark)).collect()}
        assert {k: v for k, v in got.items() if v > 0} == want
        # clique nodes hold 3 triangles each; the cross-batch 5-6-7
        # triangle was counted exactly once
        assert got[1] == 3 and got[5] == 1
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_triangles_replay_idempotent(spark, tmp_path):
    """Re-running the stream over the same feed with a FRESH checkpoint
    (worst-case redelivery: every batch re-folds) must not change the
    maintained counts."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = str(tmp_path / "feed")
        _write_feed(src)
        state = str(tmp_path / "state")
        q = start_triangle_stream(spark, src, state, str(tmp_path / "ck1"))
        q.awaitTermination(300)
        before = sorted(map(tuple, current_triangle_counts(
            spark, state).collect()))
        q = start_triangle_stream(spark, src, state, str(tmp_path / "ck2"))
        q.awaitTermination(300)
        after = sorted(map(tuple, current_triangle_counts(
            spark, state).collect()))
        assert before == after
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_partials_sort_numerically(tmp_path):
    """b10 must come AFTER b9 (round-6 ADVICE high: lexicographic
    listing froze 'latest' at b9 once ids hit double digits)."""
    from dht11_data_pipeline_spark.streaming.graph import _partials
    root = tmp_path / "state" / "counts"
    for bid in (0, 2, 9, 10, 11):
        (root / f"b{bid}").mkdir(parents=True)
    (root / "not-a-batch").mkdir()
    got = [os.path.basename(p) for p in _partials(str(tmp_path / "state"),
                                                  "counts")]
    assert got == ["b0", "b2", "b9", "b10", "b11"]
    below = [os.path.basename(p) for p in _partials(
        str(tmp_path / "state"), "counts", below=10)]
    assert below == ["b0", "b2", "b9"]


def test_streaming_components_double_digit_batches(spark, tmp_path):
    """12 single-edge micro-batches chaining 0-1-...-12: the merges from
    batches 10 and 11 must survive (lexicographic 'latest' would resume
    from b9's labels and silently drop them)."""
    from dht11_data_pipeline_spark.operators.graph import (
        connected_components)
    from dht11_data_pipeline_spark.streaming.graph import (
        current_components, start_components_stream)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        src = tmp_path / "feed"
        os.makedirs(src)
        edges = [(i, i + 1) for i in range(12)]
        for b, (a, bb) in enumerate(edges):
            path = src / f"f{b:02d}.json"
            path.write_text(json.dumps({"id_a": a, "id_b": bb}) + "\n")
            os.utime(path, (1_700_000_000 + b, 1_700_000_000 + b))
        q = start_components_stream(
            spark, str(src), str(tmp_path / "state"),
            str(tmp_path / "ckpt"))
        q.awaitTermination(600)
        parts = os.listdir(str(tmp_path / "state" / "labels"))
        assert len(parts) == 12 and "b10" in parts and "b11" in parts
        got = sorted(map(tuple, current_components(
            spark, str(tmp_path / "state")).collect()))
        want = sorted(map(tuple, connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long"),
            "id_a", "id_b").collect()))
        assert got == want
        # the whole chain is ONE cluster rooted at node 0 — only true if
        # the batch-10 and batch-11 merges actually folded in
        assert {lbl for _, lbl in got} == {0}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_streaming_components_equal_batch(spark, tmp_path):
    from dht11_data_pipeline_spark.operators.graph import (
        connected_components)
    from dht11_data_pipeline_spark.streaming.graph import (
        current_components, start_components_stream)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        src = str(tmp_path / "feed")
        _write_feed(src)
        q = start_components_stream(
            spark, src, str(tmp_path / "state"), str(tmp_path / "ckpt"))
        q.awaitTermination(300)
        got = sorted(map(tuple, current_components(
            spark, str(tmp_path / "state")).collect()))
        want = sorted(map(tuple, connected_components(
            _all_edges(spark), "id_a", "id_b").collect()))
        assert got == want
        # components really did merge ACROSS batches: 5-6-7 is one
        # cluster rooted at 5 even though its edges span batches 1 and 2
        labels = dict(got)
        assert labels[7] == 5 and labels[6] == 5
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
