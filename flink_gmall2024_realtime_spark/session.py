"""SparkSession factory — the engine's ``BaseApp`` equivalent.

Reference: ``realtime-common/src/main/java/.../base/BaseApp.java:24-62`` sets up
the Flink env (parallelism 4, HashMap state backend, 5 s exactly-once
checkpoints).  Here the same role is one well-configured ``SparkSession``:

- session timezone pinned to ``Asia/Shanghai`` (``DateFormatUtil.java:28``
  hard-codes ``+08:00``) so date/time functions hash-match the oracle;
- AQE on (runtime re-planning, skew-join handling, partition coalescing) —
  this is what lets the same plan survive a 100x scale-up;
- shuffle partitions sized from the environment (32 locally; a real cluster
  sets this to ~2-3x total cores, or lets AQE coalesce);
- Arrow enabled so the few Pandas-UDF operators move data in columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SESSION_TZ = "Asia/Shanghai"


def _default_driver_mem() -> str:
    """min(24g, ~70% of MemAvailable), floored at 2g.  /proc/meminfo is
    Linux-only; hosts without it get the full 24g ask (macOS dev boxes are
    expected to set SPARK_GRAFT_DRIVER_MEM)."""
    avail_kb = None
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_kb = int(line.split()[1])
                    break
    except OSError:
        pass
    if avail_kb is None:
        return "24g"
    g = max(2, min(24, int(avail_kb * 0.7 / 1024 / 1024)))
    return f"{g}g"


def get_spark(
    app_name: str = "gmall-pyspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    On a real cluster ``master`` comes from spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", SESSION_TZ)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Split small files aggressively: the default 4 MB open-cost makes a
        # 5 MB table scan as ONE partition, serializing every map-side pass
        # over it. 64 KB keeps single-digit-MB fixture tables parallel while
        # changing nothing for the many-large-files case that dominates at
        # warehouse scale.
        .config("spark.sql.files.openCostInBytes", str(64 * 1024))
        # Fixture events.parquet carries TIMESTAMP(NANOS) which the Parquet
        # reader rejects by default; read as bigint nanos and normalize to a
        # timestamp_ntz in sources.fixtures (ns are exact multiples of 1000).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming state: RocksDB scales to large keyed state (daily-UV dedup
        # over hundreds of millions of keys); HDFS-backed default would OOM.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # local[N] puts driver + all N executor threads in ONE heap: size it
        # like N executor cores, not like a driver. 8g / 32 tasks = 250 MB
        # per task, which OOMs fact-fact sort-merge joins at 100x fixtures
        # (q8 found this); 24g = 750 MB/task, the floor of what a real
        # cluster would give each core — but only when the host actually has
        # it (a 24g ask on a 16 GB laptop fails to launch the JVM), so the
        # default is min(24g, ~70% of MemAvailable). Clusters size executors
        # explicitly; SPARK_GRAFT_DRIVER_MEM overrides everything.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
    )
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_GRAFT_NO_MASTER"):
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    # Deployment/experiment passthrough: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    # (cluster operators size shuffle/memory knobs per environment; the
    # r15 config A/Bs were measured through this seam).
    for pair in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if "=" in pair:
            k, _, v = pair.partition("=")
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
