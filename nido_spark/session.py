"""SparkSession factory with scale-appropriate defaults.

Local mode is a single JVM; on a real cluster the same settings apply except
memory sizing. AQE is always on: it handles skew-join splitting and
post-shuffle partition coalescing at runtime, which matters for the
Zipf-skewed conv->tool bipartite edges (FIXTURES.md §1).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nido_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores=None`` uses ``local[*]``. ``shuffle_partitions`` defaults to the
    core count — the right size for local mode; on a cluster it should be
    ~2-3x total executor cores (set via ``extra_conf``).

    Cluster deployment: set ``NIDO_SPARK_MASTER=external`` when launching
    through ``spark-submit --master <url> --py-files nido_spark.zip`` — the
    builder then does NOT call ``.master()``, deferring to the launcher's
    cluster manager instead of silently overriding it with local mode (any
    other value of the env var is used as the master URL directly).
    """
    env_master = os.environ.get("NIDO_SPARK_MASTER")
    if env_master == "external":
        master = None
    elif env_master:
        master = env_master
    else:
        master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cores if cores else (os.cpu_count() or 8)
    builder = SparkSession.builder
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # bucketed tables (io.write_bucketed_edges) land here, not in $PWD
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/nido-spark-warehouse"),
        )
        # iterative loops churn checkpointed RDDs/broadcasts; default
        # periodic cleaner GC is 30min — far too lazy for 100-sweep loops
        .config("spark.cleaner.periodicGC.interval", "60s")
        # AQE partition coalescing targets max(bytes/parallelism,
        # minPartitionSize); the 1 MB default floor collapses small-byte /
        # heavy-compute stages (array intersections, per-row text kernels)
        # onto 1-4 cores — measured 3-14x stage slowdowns on the dedup
        # verify path at sf0.1 (its shuffle is ~15 MB for seconds of
        # per-row hash-set work). 256k keeps those stages at full
        # parallelism while still coalescing genuinely tiny exchanges
        # (round-6 A/B over full suite draws: 256k beat both 64k — which
        # over-fragmented the iterative V-row loops — and the 1 MB
        # default). At scale bytes/parallelism >> 1 MB and the floor is
        # never the binding term, so cluster plans are unchanged (guide
        # §2: derive partitioning from input size). Env-parameterised for
        # deployment tuning.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("NIDO_AQE_MIN_PARTITION_SIZE", "256k"),
        )
    )
    # local mode: shuffle files on tmpfs — the machine's single data disk is
    # otherwise the scaling wall for shuffle-bound stages (a real cluster
    # gets this from the cluster manager's SPARK_LOCAL_DIRS instead)
    local_dir = os.environ.get(
        "SPARK_LOCAL_DIRS",
        "/dev/shm/nido-spark-local" if os.path.isdir("/dev/shm") else None,
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
