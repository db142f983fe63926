"""SparkSession factory with scale-appropriate defaults.

Local mode is for tests/bench only; the conf is written so the same
code runs unchanged on a multi-executor cluster via
``spark-submit --py-files`` (north rule). All knobs are overridable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for the local[32]/128GiB sandbox; on a real cluster
#: spark-submit conf wins (these are only applied when building a new
#: session, and executor topology comes from the submit command).
_DEFAULT_CONF = {
    # ~1 shuffle partition per core locally; AQE coalesces the rest.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Arrow for all pandas UDF / toPandas traffic.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # local mode = driver-only JVM; this is the only memory knob.
    # 16g is ample for the sandbox workloads — and MUST be committed
    # up front (see get_spark): a growable heap stalls 25-30 s at high
    # parallelism while G1 uncommits and re-faults zeroed pages.
    "spark.driver.memory": "16g",
    "spark.ui.enabled": "false",
    # Deterministic parquet output (no task-attempt suffixes in data).
    "spark.sql.parquet.compression.codec": "snappy",
}


def get_spark(
    app_name: str = "inverted_index_and_search_spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the bench harness can sweep parallelism levels (N vs 4N cores)
    for the scaling-efficiency evidence required by the north rule.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    merged = dict(_DEFAULT_CONF)
    if conf:
        merged.update(conf)
    if "spark.driver.extraJavaOptions" not in merged:
        # Pin Xms to Xmx and pre-touch: an elastic G1 heap intermittently
        # stalls tens of seconds re-committing pages under 32-thread
        # allocation bursts (measured 30 s vs 1.8 s on the same job).
        mem = merged["spark.driver.memory"]
        merged["spark.driver.extraJavaOptions"] = (
            f"-Xms{mem} -XX:+AlwaysPreTouch")
    for k, v in merged.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
