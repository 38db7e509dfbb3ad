"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched Pandas UDFs (``mapInPandas``).

The image/audio decode libraries are not in this container, so the
decode step is STUBBED: ``decode_image_stub`` raises
NotImplementedError unless ``fake=True``, in which case it derives
deterministic fake features from the byte payload. Everything
Spark-side — binary schema, Arrow batch transfer, UDF signature,
output schema, partitioning — is real and tested; swapping the stub
for PIL/librosa is a one-function change.

Scale: mapInPandas streams Arrow record batches through Python —
payload bytes never materialize on the driver; batch size is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch``. Partition count
should track input splits (binary blobs are big: keep
``maxPartitionBytes`` moderate so a partition's batch fits in worker
memory).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, fake_width int, fake_height int, checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Materialize an opaque binary column + typed metadata struct —
    the storage shape a real image/audio table would have (payload:
    binary, meta: struct<mime,source_len>)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.length(text_col).alias("source_len"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, fake: bool = True) -> tuple[int, int]:
    """Placeholder for a real decoder (PIL.Image.open etc.)."""
    if not fake:
        raise NotImplementedError("image decode requires PIL — not in this container")
    n = len(payload)
    return n % 256, (n // 256) % 256  # deterministic fake (width, height)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode_image_stub(p, fake=True) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in payloads],
                "fake_width": [d[0] for d in dims],
                "fake_height": [d[1] for d in dims],
                "checksum": [hashlib.sha256(p).hexdigest() for p in payloads],
            })

    return binary_df.mapInPandas(_batches, schema=FEATURE_SCHEMA)
