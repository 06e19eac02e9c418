from mini_data_platform_spark.sinks.audit import AuditLog
from mini_data_platform_spark.sinks.objects import move_object
from mini_data_platform_spark.sinks.upsert import (
    merge_into_sql,
    on_conflict_sql,
    upsert_dbapi,
    upsert_parquet,
)

__all__ = [
    "AuditLog",
    "move_object",
    "merge_into_sql",
    "on_conflict_sql",
    "upsert_dbapi",
    "upsert_parquet",
]
