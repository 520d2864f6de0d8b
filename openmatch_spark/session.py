"""SparkSession factory with scale-appropriate defaults.

Single place that owns engine configuration so tests, bench, and spark-submit
jobs share identical semantics. On a real cluster the same conf applies; only
master/parallelism change (passed via spark-submit, never hardcoded here).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def scoped_confs(spark: SparkSession, confs: dict[str, str]):
    """Set session confs for the duration of a block, restoring prior
    values (or unsetting) on exit — success OR failure. The single owner of
    the save/set/restore idiom used by build, compaction, and query-side
    conf scoping (three hand-rolled copies of this diverge eventually).

    A None value snapshots-and-restores the key without setting it (for
    callers that decide the value mid-block, like build_index).
    """
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            if v is not None:
                spark.conf.set(k, v)
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def get_spark(
    app_name: str = "openmatch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults target the sandbox (local[N]); on a cluster, pass master=None and
    let spark-submit supply it. shuffle_partitions defaults to the declared
    core count so small-scale runs don't fragment into 200 empty tasks; a
    100 TB run would set this to ~2-3x total cores (and rely on AQE coalesce).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_SUBMIT_DEPLOY_MODE"):
        builder = builder.master(f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow everywhere: all Python-side work is vectorized pandas UDFs.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # AQE: runtime coalesce + skew-join splitting; we still salt explicitly
        # for groupBy skew (AQE only fixes join skew).
        # limit/take probes: Spark's CollectLimit ramps up from ONE scanned
        # partition (then 4x per round), so a take(n) over a small table
        # split into defaultParallelism partitions pays 3-4 sequential job
        # rounds before it has seen every row. Starting the ramp at one
        # executor wave collapses that to a single job; for genuinely huge
        # inputs the first probe still scans only `cpus` partitions.
        "spark.sql.limit.initialNumPartitions": str(cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
        # task-side output commit (v2): the v1 default renames every
        # partition dir SERIALLY on the driver — a fixed cost that grows
        # with dir count (shards x term_buckets), not data, and caps
        # scaling efficiency at high parallelism. v2 is the standard
        # choice on clusters (cloud committers do the same thing).
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.extraJavaOptions": "-Dio.netty.tryReflectionSetAccessible=true",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
