"""SparkSession construction and runtime tuning.

The driver contract passes us an already-built SparkSession, so anything
scale-critical that can be set at *runtime* lives in :func:`tune` (called
from every query entry point); :func:`get_spark` is for tests/bench where
we own the session.

Scale notes (local[32] here, 1000-executor cluster in spirit):
- AQE on: runtime coalescing, skew-join splitting, dynamic join strategy.
- shuffle.partitions sized to cores locally; on a real cluster AQE
  coalesces from a higher initial number, so we set initialPartitionNum.
- Arrow enabled for the few Pandas-UDF paths (similarity/multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to any session we receive.
_RUNTIME_CONF = {
    # sized for local[32]; a real cluster overrides it (AQE coalesces
    # from the initial number anyway) — without this a default-config
    # driver session runs 200 shuffle tasks, which multiplies Python
    # worker batch overhead on the pandas-UDF paths
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~10MB broadcast threshold is default; dims here are tiny, AQE will
    # convert to broadcast joins from runtime stats anyway.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # testdata events.ts is parquet TIMESTAMP(NANOS) which Spark has no
    # native type for; read as long and convert in the catalog layer.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to a session we did not build. Idempotent."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — fine
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make `tytodb_spark` importable on Python WORKERS. Module-level
    functions referenced from mapInPandas/applyInPandas/UDTF closures
    are cloudpickled BY REFERENCE, so workers must import the package —
    which fails when the driver found it via a sys.path hack (the
    driver-contract import runs with cwd outside the repo). Shipping a
    zip via addPyFile covers local workers and real executors alike."""
    sc = spark.sparkContext
    if getattr(sc, "_tyto_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="tytodb_spark_pkg_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    sc.addPyFile(zpath)
    sc._tyto_pkg_shipped = True


def get_spark(app_name: str = "tytodb_spark", cpus: str | None = None) -> SparkSession:
    """Build a local session for tests/bench (driver owns its own)."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("TYTO_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/tyto_spark_warehouse")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
