"""SparkSession construction tuned for the MEDS workload.

Local-mode settings mirror what a 1000-executor cluster deployment would
set per-executor; the knobs that matter at 100 TB (AQE, skew-join handling,
shuffle partition sizing, Arrow transfer for the Pandas-UDF escape hatches)
are on by default so plans developed here carry over unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "meds_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-appropriate defaults.

    - AQE on: runtime coalescing of small shuffle partitions and skew-join
      splitting replace the reference's manual shard-size knobs
      (``row_chunksize``/``n_patients_per_shard``,
      reference configs/stage_configs/shard_events.yaml:2).
    - Arrow on: every Pandas-UDF boundary is Arrow-batched.
    - UTC session timezone: MEDS times are naive µs timestamps
      (reference extract/__init__.py:16-21); pinning the zone makes
      parquet round-trips byte-stable across machines.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Polars-equivalent non-strict semantics: unparseable casts -> null
        # (P8 coercion), x/0 -> null/inf instead of error. The reference
        # relies on non-strict behavior throughout
        # (convert_to_sharded_events.py:445-490).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
