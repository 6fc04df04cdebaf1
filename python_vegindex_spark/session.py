"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point, scaled down for local[N]:
AQE on (runtime re-plan + skew-join splitting), shuffle partitions sized
to cores in local mode, Arrow enabled for every pandas UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def scratch_dir() -> str:
    """Scratch space for shuffle files and transient tables.

    Library default: the system temp dir — shuffle spill belongs on disk,
    not on RAM-backed tmpfs (a big spill on tmpfs turns the disk-spill
    safety valve into an OOM hazard). The bench scripts opt into tmpfs by
    exporting ``VXS_SCRATCH=/dev/shm``, because this sandbox throttles
    buffered root-disk writes to a few MB/s which otherwise inverts core
    scaling; on a real cluster spark.local.dir maps to executor-local
    NVMe instead.
    """
    override = os.environ.get("VXS_SCRATCH")
    if override and os.path.isdir(override) and os.access(override, os.W_OK):
        return override
    import tempfile

    return tempfile.gettempdir()


def _export_package_to_workers() -> str:
    """Put this package's parent directory on the Python-worker path.

    Arrow/pandas UDF closures (codecs, roi stats, greedy packing)
    reference module-level functions, which cloudpickle serializes BY
    REFERENCE — the worker must be able to ``import
    python_vegindex_spark``. Under ``spark-submit --py-files`` (the
    production path) submit handles that; for driver-side/interactive
    use the workers only inherit the driver's CWD, so a script run from
    any other directory fails with ModuleNotFoundError. Exporting
    PYTHONPATH *before* the JVM gateway launches makes local-mode
    workers inherit it. Returns the resulting PYTHONPATH (also mirrored
    into ``spark.executorEnv.PYTHONPATH`` — meaningful only when the
    same path exists on the executors, as in local and single-image
    container clusters; real multi-node deploys use --py-files)."""
    parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            parent + (os.pathsep + existing if existing else "")
        )
    return os.environ["PYTHONPATH"]


def get_spark(
    app_name: str = "python_vegindex_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the rollup engine.

    In production this runs under ``spark-submit --py-files`` on a real
    cluster and ``master`` is None (cluster manager decides). In the
    sandbox, ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]``.
    """
    worker_pythonpath = _export_package_to_workers()
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        if master.startswith("local["):
            inner = master[6:-1]
            shuffle_partitions = 32 if inner == "*" else max(8, int(inner))
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.local.dir", os.path.join(scratch_dir(), "vxs-spark-local"))
        .config("spark.executorEnv.PYTHONPATH", worker_pythonpath)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
