"""Round-7 additions: empty-document codec-oracle parity (round-6
ADVICE: the fixtures contain no empty texts, so the jpeg oracle's
dropped-row bug was invisible to the driver)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

REAL_SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def edge_sf_dir(tmp_path_factory):
    """An sf_dir whose documents table contains the edge cases the
    generated fixtures lack: empty text, one byte, exactly one jpeg
    block row (8), one gif pixel row (64), and one past each boundary.
    All other tables symlink to sf0.001 so diffcheck's view
    registration works unchanged."""
    import pandas as pd

    root = tmp_path_factory.mktemp("edge_sf")
    texts = ["", "a", "abcdefgh", "x" * 63, "y" * 64, "z" * 65]
    pd.DataFrame({
        "doc_id": list(range(1, len(texts) + 1)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["edge"] * len(texts),
    }).to_parquet(root / "documents.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{REAL_SF}/{t}.parquet", root / f"{t}.parquet")
    return str(root)


@pytest.mark.parametrize("key", ["mm_jpeg_decode", "mm_gif_decode",
                                 "mm_png_decode", "mm_frame_sample",
                                 "dedup_cdc_chunks"])
def test_codec_oracles_survive_empty_docs(spark, edge_sf_dir, key):
    import __spark_entry__ as E
    from diffcheck import compare_one

    problems = compare_one(spark, key, E.queries()[key],
                           E.oracle_sql()[key], edge_sf_dir)
    assert problems == []


def test_jpeg_roundtrip_emits_row_for_empty_doc(spark):
    from dht11_data_pipeline_spark.operators import multimodal

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rows = multimodal.jpeg_roundtrip(df, blocks_per_row=8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"], r["n_blocks"],
            r["pixel_sum"], r["max_abs_err"]) == (64, 8, 8, 0, 0)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_documents_fixture_is_ascii(sf_dir):
    """The mm_* codec oracles index CHARACTERS while the Python codecs
    consume UTF-8 BYTES; the two agree only on ASCII text. Pin the
    fixture property the oracles rely on (documented at the
    mm_qoi_decode oracle) so a regenerated corpus cannot silently
    break byte/char parity."""
    import duckdb

    (n_bad,) = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/documents.parquet') "
        "WHERE octet_length(encode(text)) <> length(text)").fetchone()
    assert n_bad == 0
