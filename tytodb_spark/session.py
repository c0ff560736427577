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

# Shuffle width is SCALE-DEPENDENT: 32 is sized for the local[32]
# bench (200 default-config tasks multiply Python-worker batch overhead
# on the pandas-UDF paths); a cluster deployment must NOT inherit it —
# set TYTO_SHUFFLE_PARTITIONS to ~2x total executor cores there (AQE
# coalesces down from it per advisory size, but can never split a
# too-coarse non-skewed shuffle up).
_SHUFFLE_PARTITIONS = os.environ.get("TYTO_SHUFFLE_PARTITIONS", "32")

# Runtime-settable SQL confs applied to any session we receive.
_RUNTIME_CONF = {
    "spark.sql.shuffle.partitions": _SHUFFLE_PARTITIONS,
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


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently pinned in executor storage (cached
    or checkpointed)."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.iterator()
    ids: set[int] = set()
    while it.hasNext():
        ids.add(it.next()._1())
    return ids


def release_persistent_rdds(spark: SparkSession, keep: set[int]) -> int:
    """Explicitly unpersist every persistent RDD whose id is not in
    ``keep``. Returns the number released.

    Why this exists: the registry's reuse barriers are
    ``localCheckpoint(eager=False)``, whose blocks are supposed to be
    reclaimed by the ContextCleaner once the plan is garbage — and for
    a SINGLE checkpoint they are (~25 s after GC, measured). But a
    checkpoint whose plan reads ANOTHER checkpoint (q378/q436/q466's
    edge -> orientation -> adjacency chains) is never reclaimed: the
    truncated-lineage RDDs keep each other reachable and the weak-ref
    cleanup never fires (measured: pinned through 60+ s of explicit
    driver+JVM GC). A registry-iterating driver (bench, sweeps, a
    resident query service) must therefore release a finished query's
    blocks EXPLICITLY — only after its action completes; unpersisted
    local checkpoints cannot recompute."""
    m = spark.sparkContext._jsc.sc().getPersistentRDDs()
    it = m.iterator()
    n = 0
    while it.hasNext():
        kv = it.next()
        if kv._1() not in keep:
            kv._2().unpersist(False)
            n += 1
    return n


class checkpoint_scope:
    """Context manager: release every persistent RDD a block of work
    pins (its localCheckpoint barriers) once it finishes — the
    per-query janitor for registry-iterating drivers. Use around a
    COMPLETED query (define + act + read result inside the scope);
    blocks released on exit cannot be recomputed."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self._before = persistent_rdd_ids(self.spark)
        return self

    def __exit__(self, *exc):
        release_persistent_rdds(self.spark, self._before)
        return False


def get_spark(app_name: str = "tytodb_spark", cpus: str | None = None) -> SparkSession:
    """Build a local session for tests/bench (driver owns its own)."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", _SHUFFLE_PARTITIONS)
        .config("spark.driver.memory", os.environ.get("TYTO_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Progress bars interleave \r-terminated fragments with stdout in
        # captured logs (the round driver keeps a tail of combined output
        # and parses the bench's one JSON line from it) and cost a redraw
        # timer; a non-interactive harness has no use for them.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.warehouse.dir", "/tmp/tyto_spark_warehouse")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
