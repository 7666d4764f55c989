"""SparkSession builder with the engine's scale-oriented defaults.

Tuned for the extraction workload: Arrow-batched Python UDF transfer,
AQE with skew handling for the relational shell (lineage joins, metrics
rollups), and conservative Arrow batch sizes so giant documents cannot
blow the Python worker (SURVEY.md §7 "per-doc recursion depth / giant
docs").

On a real cluster these same configs apply unchanged; only
``master``/executor sizing differs (spark-submit --py-files, see
README).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: docs per Arrow batch; small enough that a batch of giant documents
#: stays well under worker memory at ~1 MB/doc.
ARROW_BATCH_SIZE = 256


def build_session(
    app_name: str = "readability-extract",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE)
        )
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
