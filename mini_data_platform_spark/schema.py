"""Canonical schemas for the sales ingestion surface.

Behavioral parity targets (citations into /root/reference/, read-only):
- required column set: dags/src/validator.py:14
- sink DDL (types):    sql/create_tables.sql:3-11
- audit table DDL:     sql/create_tables.sql:16-24
"""

from __future__ import annotations

from pyspark.sql import types as T

#: The six required sales columns, in canonical order.
SALES_COLUMNS = ("sale_id", "sale_date", "customer_id", "product_id", "quantity", "amount")

#: Typed schema after cleaning/coercion (what the sink receives).
SALES_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.StringType(), False),
        T.StructField("sale_date", T.TimestampType(), True),
        T.StructField("customer_id", T.StringType(), True),
        T.StructField("product_id", T.StringType(), True),
        T.StructField("quantity", T.IntegerType(), True),
        T.StructField("amount", T.DoubleType(), True),
    ]
)

#: All-string read schema: raw files are parsed with every column as string
#: and coerced explicitly afterwards, mirroring the reference's two-phase
#: read-then-coerce (dtype=str read at processor.py:23). This keeps parse
#: failures visible to the coercion rules instead of the CSV reader.
SALES_RAW_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in SALES_COLUMNS]
)

#: Audit-log schema (file_ingestion_log, sql/create_tables.sql:16-24).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.StringType(), False),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("detected_at", T.TimestampType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("rows_processed", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), True),
    ]
)

#: Status vocabulary (process_sales_dags.py:132-134,151,167,172,190,196).
AUDIT_STATUSES = (
    "validated",
    "validation_failed",
    "processed",
    "processing_failed",
    "loaded",
    "load_failed",
)
