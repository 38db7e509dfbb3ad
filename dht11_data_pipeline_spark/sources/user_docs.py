"""Schemaless document-collection source — reference S2 parity
(``get_user_data.py:10-30``: Firestore ``users`` collection streamed
doc-by-doc, 12 known fields projected, missing fields defaulted to
``None``, the document key promoted to a column).

Spark-native: ``spark.read.schema(...).json`` — an absent JSON field
becomes NULL by schema (no per-field ``dict.get`` loop), extra fields
are dropped, and the whole read distributes across files. The doc-id
promotion (``get_user_data.py:18``) is just another column here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the 12-field template of get_user_data.py:20-27 (email is the doc key)
USER_FIELDS = [
    "first_name", "last_name", "gender", "country", "state", "city",
    "dob", "phone", "profession", "income", "marital_status", "education",
]

USER_SCHEMA = T.StructType(
    [T.StructField("email", T.StringType())]
    + [T.StructField(f, T.StringType()) for f in USER_FIELDS]
)


def read_user_docs(spark: SparkSession, path: str) -> DataFrame:
    """Read JSON-lines user documents with the fixed 12-field template;
    missing fields arrive as NULL (the reference's ``dict.get(f, None)``
    defaulting, done by schema instead of Python)."""
    return spark.read.schema(USER_SCHEMA).json(path)


def normalized_users(docs: DataFrame) -> DataFrame:
    """Reference-shaped projection: doc key first, template order, and
    a completeness score the reference computes implicitly by counting
    non-None fields downstream."""
    non_null = sum(
        (F.when(F.col(f).isNotNull(), 1).otherwise(0) for f in USER_FIELDS),
        F.lit(0),
    )
    return docs.select(
        "email", *USER_FIELDS,
        non_null.cast("int").alias("n_fields_present"),
    )
