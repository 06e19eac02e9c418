"""mini_data_platform_spark — a PySpark-native analytics & ingestion engine.

A from-scratch re-expression of the capabilities of the reference platform
(K12Boateng/mini-data-platform, studied read-only at /root/reference/):
multi-format ingestion with validation + quarantine, pandas-parity cleaning
and coercion, keyed dedup, keyed upsert sinks, an audit log, the KPI query
surface — plus the LLM-training-data extension operators (similarity dedup,
vector search, text analysis, multimodal column plumbing), all designed
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst, with
partitioning/broadcast/AQE choices made for 100 TB scale.

Nothing here is a translation of the reference's pandas code; reference
file:line citations appear in docstrings only to document behavioral parity.
"""

__version__ = "0.1.0"

from mini_data_platform_spark.session import get_spark  # noqa: F401
from mini_data_platform_spark.catalog import TABLES, load_table, load_tables, register_views  # noqa: F401
