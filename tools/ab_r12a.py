"""Round-12 A/B, part 1: AQE size-based partition coalescing.

spark.sql.adaptive.coalescePartitions.parallelismFirst defaults to
true, which coalesces post-shuffle partitions only down to the session
default parallelism (32 here) "to maximize parallelism" — so a 2 MB
shuffle still schedules 32 near-empty tasks per stage. The Spark docs
themselves recommend setting it to false in production so partitions
coalesce to advisoryPartitionSizeInBytes instead (guide §2.2: fewer,
larger reduce partitions). At sf0.1 nearly every stage's shuffle is
tiny, so task-launch overhead dominates; at warehouse scale size-based
coalescing is what you want anyway — this is the rare conf that is
right for BOTH.

Interleaved A/B in ONE warmed session, toggling the runtime conf per
rep: arm A = parallelismFirst true (status quo), arm B = false.

Usage: python tools/ab_r12a.py [reps]
Env: AB_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark import queries as Q
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")

PANEL = [
    # small scheduling-floor queries (the 460-query mass)
    "q04_projection",
    "q330_predicate_selectivity",
    "q331_wilson_ctr",
    "q344_priority_waiting_semi",
    "q358_ratio_delta_method",
    "q38_approx_distinct",
    # medium
    "q365_kruskal_wallis",
    "q135_count_min_sketch",
    "q379_qq_table",
    "q336_spearman",
    # heavy tail / diverse execution shapes
    "q436_edge_support",
    "q413_pagerank_cosupply",
    "q166_pipeline_funnel",
    "q81_kmeans_clusters",
    "q51_grouped_rank",       # applyInPandas
    "q172_stream_heavy_hitters",  # structured streaming drain
]


def run_once(spark, name: str) -> float:
    qd = Q.REGISTRY[name]
    fn = qd.bench_fn or qd.fn
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r12a", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"

    # warm both arms once (codegen is conf-independent, but AQE final
    # plans differ; warm each query under each arm)
    for v in ("true", "false"):
        spark.conf.set(key, v)
        for name in PANEL:
            try:
                run_once(spark, name)
            except Exception as e:
                print(f"warm {name} [{v}]: {e}", file=sys.stderr)

    times: dict[str, dict[str, list[float]]] = {
        n: {"true": [], "false": []} for n in PANEL
    }
    for rep in range(reps):
        for name in PANEL:
            for v in ("true", "false"):
                spark.conf.set(key, v)
                times[name][v].append(run_once(spark, name))

    print(f"{'query':35s} {'A(min)':>8s} {'B(min)':>8s} {'B/A':>6s}")
    for name in PANEL:
        a = min(times[name]["true"])
        b = min(times[name]["false"])
        print(f"{name:35s} {a:8.2f} {b:8.2f} {b / a:6.2f}")
    ta = sum(min(times[n]["true"]) for n in PANEL)
    tb = sum(min(times[n]["false"]) for n in PANEL)
    print(f"{'TOTAL (sum of mins)':35s} {ta:8.2f} {tb:8.2f} {tb / ta:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
