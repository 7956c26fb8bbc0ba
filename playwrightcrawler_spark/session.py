"""SparkSession factory tuned for this engine.

Local-mode defaults target the sandbox (local[32], single JVM); on a real
cluster the same settings apply minus master/driver-memory, and the tables
move from bare parquet to an Iceberg catalog (see sources/tables.py for the
mapping). All knobs are chosen for the 100 TB design point:

- AQE on (runtime skew-join splitting + partition coalescing);
- shuffle partitions sized to cores locally, to ~2-3× total cores on a
  cluster;
- Arrow batches capped so a pathological 900k-char text column can't blow
  executor memory inside a pandas UDF (reference analogue: the 6 GB
  per-process abort, config.py:224-233).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from playwrightcrawler_spark import config


def get_spark(
    app_name: str = "playwrightcrawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or config.DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # small enough that a wave-sized html scan still splits across all
        # cores (a 1 GB corpus at the 128 MB default is 8 tasks — extraction
        # would cap at 8-way parallelism no matter the core count)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
    )
    evlog = os.environ.get("SPARK_GRAFT_EVENTLOG")
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evlog)
            # plain JSON so offline tooling can parse without zstd bindings
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
