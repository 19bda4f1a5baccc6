"""SparkSession factory.

The reference creates its session through Glue (``orders_etl.py:16-21``) with no
tuning at all (no ``spark.conf.set`` anywhere, SURVEY.md §4.4). Here we own the
session and set the configs that matter at scale:

* AQE on (runtime shuffle coalescing, skew-join splitting, broadcast demotion)
* shuffle partitions sized to the local core count (on a real cluster this is
  overridden by AQE's coalescing from a higher initial value)
* Arrow enabled so any pandas_udf path is vectorized
* dynamic partition overwrite so partitioned "merge" rewrites touch only the
  partitions present in the source batch (the Delta-MERGE-like behavior)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # small-dim joins (region/nation/part at bench scale) should broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # keep timestamp semantics deterministic across engines
    "spark.sql.session.timeZone": "UTC",
    # the reference's partition columns are strings (`date`); don't let the
    # file index re-type directory values (date=2025-04-01 → DateType)
    "spark.sql.sources.partitionColumnTypeInference.enabled": "false",
    "spark.sql.parquet.compression.codec": "snappy",
    # read INT64(TIMESTAMP(NANOS)) parquet columns as long (Spark has no
    # nanosecond timestamp type); loaders convert to micros explicitly
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 128MB input splits: at 100 TB this yields ~800k tasks, a sane task count
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Python-worker connect-back accept timeout (default 15s). A transient
    # host stall longer than that while a worker process is being spawned
    # kills the whole query with "Python worker failed to connect back" —
    # observed repeatedly on the r14 bench host (multi-second VM freezes),
    # always on streaming legs (every micro-batch of a Python data source
    # spawns workers, maximizing exposure). Raising the ACCEPT timeout is
    # pure robustness: the good case connects in milliseconds regardless.
    "spark.python.authenticate.socketTimeout": "120s",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "lakehouse-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for dev; on a cluster
    pass ``None`` via spark-submit and the submit-time master wins.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    if master and master.startswith("local"):
        # In local mode the driver JVM IS the executor, and it also
        # BUILDS every broadcast relation — pyspark's 1g default heap
        # cannot hold a 64 MiB-threshold broadcast once it inflates
        # 5-10x on-heap (found by the sf1.0 scale probe: a broadcast
        # build OOM at 10x data). On a real cluster spark-submit owns
        # this; only the local dev/bench default is raised here.
        conf["spark.driver.memory"] = os.environ.get(
            "SPARK_GRAFT_DRIVER_MEM", "8g"
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    want_mem = conf.get("spark.driver.memory")
    if want_mem:
        # builder.config only takes effect when THIS process launches the
        # JVM — under spark-submit, or when getOrCreate reuses a running
        # session, the setting is silently ignored. Warn instead of
        # failing: the submit-time owner may have sized it deliberately.
        got_mem = spark.sparkContext.getConf().get("spark.driver.memory", "")
        if got_mem != want_mem:
            import warnings

            warnings.warn(
                f"requested spark.driver.memory={want_mem} but the JVM "
                f"runs with {got_mem or '(default 1g)'} — the session "
                "predates this call or was launched via spark-submit; "
                "broadcast-heavy local runs may OOM (set --driver-memory "
                "or SPARK_GRAFT_DRIVER_MEM at launch)",
                RuntimeWarning,
                stacklevel=2,
            )
    return spark
