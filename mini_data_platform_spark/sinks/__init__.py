from mini_data_platform_spark.sinks.audit import AuditLog
from mini_data_platform_spark.sinks.notify import (
    file_notifier,
    format_report,
    log_notifier,
    smtp_notifier,
)
from mini_data_platform_spark.sinks.objects import move_object
from mini_data_platform_spark.sinks.upsert import (
    merge_into_sql,
    on_conflict_sql,
    upsert_dbapi,
    upsert_jdbc,
    upsert_parquet,
)

__all__ = [
    "AuditLog",
    "move_object",
    "merge_into_sql",
    "on_conflict_sql",
    "upsert_dbapi",
    "upsert_jdbc",
    "upsert_parquet",
    "file_notifier",
    "format_report",
    "log_notifier",
    "smtp_notifier",
]
