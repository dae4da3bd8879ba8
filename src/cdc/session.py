"""SparkSession factory with the engine's standard local-mode tuning.

Design notes (scale): these configs are the local[N] analog of a real
cluster submit (``spark-submit --py-files dist/cdc.zip``).  AQE is always
on — it gives runtime shuffle-partition coalescing and skew-join splitting,
both load-bearing for the hot-repo skew described in SURVEY.md §4.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "cdc-engine",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cores`` — int N -> ``local[N]``; "*" -> all cores; None -> respect an
    already-running session or $SPARK_GRAFT_CPUS (driver contract) or "*".
    """
    # Python workers (pandas-UDF executors) must be able to import cdc.*;
    # on a real cluster this is `spark-submit --py-files dist/cdc.zip`,
    # in local mode the workers inherit PYTHONPATH from the driver env.
    src_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if src_dir not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{src_dir}{os.pathsep}{pp}" if pp else src_dir

    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(str(cores)) , 8)
        except ValueError:
            shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting (SURVEY.md §4).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow transfer for pandas UDFs / createDataFrame(pandas).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # Every action formats an explain string for the SQL-listener
        # event even with the UI off; "formatted" mode expands
        # InMemoryRelation.innerChildren, so iterative jobs that nest
        # cached plans pay exponential DRIVER time before running a task
        # (cc.py history). Iterative code must still cut lineage
        # (localCheckpoint) — this just caps the cost of the event string.
        .config("spark.sql.ui.explainMode", "simple")
        .config("spark.driver.memory", os.environ.get("CDC_DRIVER_MEM", "24g"))
    )
    # Shuffle/spill to tmpfs when available: local-mode shuffles are pure
    # scratch, and the sandbox's shared disk has high I/O variance. A real
    # cluster sets spark.local.dir via the cluster manager (SSD/NVMe).
    if os.path.isdir("/dev/shm") and "spark.local.dir" not in (extra_conf or {}):
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
