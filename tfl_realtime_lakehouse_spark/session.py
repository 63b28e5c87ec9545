"""SparkSession factory with scale-aware defaults.

The reference pipeline runs UTC end-to-end (ingest stamps ``datetime.now
(timezone.utc)``; see reference ``airflow/dags/tfl_ingest_dag.py:46`` and
``scripts/tfl_align.py:121``), so the session pins
``spark.sql.session.timeZone=UTC`` — timestamp semantics must not depend
on the host timezone.

Scale posture: AQE on (runtime coalescing + skew-join splitting),
broadcast threshold left at default so small dims broadcast, shuffle
partitions sized by env for local testing but meant to be overridden to
~2-3x core count on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tfl-realtime-lakehouse-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local-mode defaults come from ``SPARK_GRAFT_CPUS`` (driver contract);
    on a real cluster, pass ``master=None`` with external conf and these
    settings still apply per-session.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 4)))
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Timestamp fidelity: UTC everywhere (reference parity).
        .config("spark.sql.session.timeZone", "UTC")
        # Adaptive execution: runtime shuffle coalescing + skew-join split.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing targets max(bytes/defaultParallelism,
        # minPartitionSize); the default 1 MB floor collapses BYTE-LIGHT
        # but COMPUTE-DENSE shuffles (HOF cosine folds, posting
        # self-joins, quadratic pair scans over hashed keys) onto 1-2
        # tasks — a suite-wide 127 s of near-serial jobs measured at
        # sf0.1 (tools/sweep_narrow_jobs.py, r11). 16 KB keeps those at
        # cluster parallelism while real shuffles (bytes/parallelism ≫
        # 16 KB) are untouched at any scale. Env-overridable so a
        # cluster deployment can retune without a code change.
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize",
            os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "16k"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas interchange (vectorized UDF path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ANSI off: cast-on-failure yields NULL, matching the reference's
        # DuckDB try_cast contract (stg_arrivals.sql:24). Explicit
        # try_cast is still used where intent matters.
        .config("spark.sql.ansi.enabled", "false")
        # Don't let tiny local files create thousands of tasks; on a
        # cluster this is retuned to executor memory.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
