"""SparkSession factory tuned for this engine.

Local test mode is ``local[N]`` (single JVM), but every conf here is chosen
to also be the right default on a 1000-executor cluster:

- AQE on (runtime shuffle coalescing, skew-join splitting, dynamic
  broadcast-join conversion) — at 100 TB, static plans are always wrong
  somewhere; AQE repairs them from runtime stats.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE's coalescing makes the initial number much less critical, and
  ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` (default 64 MB) becomes
  the effective knob.
- Session timezone pinned to UTC so timestamp semantics are deterministic and
  comparable against external oracles (DuckDB is UTC-naive).
- ANSI mode OFF: the engine's cleaning operators rely on null-on-failure
  cast/parse semantics (matching the reference's ``errors="coerce"``
  pipeline, /root/reference/dags/src/processor.py:64-66).
- Arrow on for any pandas interchange (vectorized Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "mini_data_platform_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster
    leave it unset and let spark-submit provide it.
    """
    cpus = int(DEFAULT_CPUS)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def configure_s3a(
    spark: SparkSession,
    endpoint: str,
    access_key: str,
    secret_key: str,
    path_style: bool = True,
) -> None:
    """Point the Hadoop S3A connector at an S3-compatible object store
    (e.g. MinIO, which is the reference's landing zone —
    /root/reference/docker/docker-compose.yml). Spark readers then consume
    ``s3a://bucket/prefix`` directly; no byte-download step is needed
    (replaces /root/reference/dags/src/minio_client.py:68-81).
    """
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.s3a.endpoint", endpoint)
    hconf.set("fs.s3a.access.key", access_key)
    hconf.set("fs.s3a.secret.key", secret_key)
    hconf.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hconf.set("fs.s3a.connection.ssl.enabled", "false" if endpoint.startswith("http:") else "true")
