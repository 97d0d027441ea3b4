"""SparkSession factory with the engine's scale-tuned defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    app_name: str = "blackedge-ocr-spark",
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 2048,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build a session configured for the extraction pipeline.

    - AQE on (runtime coalesce + skew-join splitting).
    - Arrow enabled; ``maxRecordsPerBatch`` bounded because span-array
      rows are fat (mega-docs) — keeps Arrow batches inside executor
      memory at 100 TB scale.
    - shuffle partitions sized to cores in local mode (the pipeline
      itself is shuffle-free; this matters for the analysis queries).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        local_n = master.removeprefix("local[").removesuffix("]")
        shuffle_partitions = int(local_n) if local_n.isdigit() else 2 * int(cpus)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records)
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
