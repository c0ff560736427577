"""Round-12 A/B, part 3: eager barriers on lazy caches that feed
broadcast futures (q125 heavy hitters, q126 NB classifier).

BroadcastExchange subtrees materialize on concurrent driver threads;
two futures racing a LAZY .cache() can each compute the full upstream
pass (the r10 q437 lesson). q125 measured bimodal across same-code
records: 1.88/2.37/2.65 s vs 4.18/6.84 s (3.6x max/min) — exactly the
double-tokenize+MG signature. Arm OLD reconstructs the pre-r12 cache
shape for q125; arm NEW is the registry (eager localCheckpoint).
q126 is verified separately (oracle + rep spread) since its operator
body is long.

Usage: python tools/ab_r12c.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.operators.textual import spread, tokens
from tytodb_spark.queries import _t
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def frequent_tokens_exact_old(
    df: DataFrame, id_col: str, text_col: str, min_frac: float = 0.02
) -> DataFrame:
    """Pre-r12 shape: lazy .cache() on the MG summaries."""
    m = max(8, int(2.0 / min_frac))
    toks = spread(df.select(id_col, text_col), id_col).select(
        F.explode(tokens(F.col(text_col))).alias("term")
    )

    def mg_partition(batches):
        counters: dict[str, int] = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            for t, c in pdf["term"].value_counts().items():
                c = int(c)
                while c > 0:
                    if t in counters:
                        counters[t] += c
                        c = 0
                    elif len(counters) < m:
                        counters[t] = c
                        c = 0
                    else:
                        d = min(min(counters.values()), c)
                        c -= d
                        for k in list(counters):
                            counters[k] -= d
                            if counters[k] == 0:
                                del counters[k]
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "n": [0] * len(counters) + [n_seen],
            }
        )

    summaries = toks.mapInPandas(mg_partition, "term string, n long").cache()
    candidates = summaries.filter(F.col("term").isNotNull()).select("term").distinct()
    total = summaries.filter(F.col("term").isNull()).agg(
        F.sum("n").cast("bigint").alias("__n")
    )
    return (
        toks.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("__n")))
        .select("term", "cnt")
    )


def q125_old(spark, sf_dir):
    return frequent_tokens_exact_old(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_frac=0.02
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_r12c", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tests.oracle_compare import compare, duckdb_connect

    for name in ("q125_heavy_hitters", "q126_nb_classifier"):
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
            con = duckdb_connect(sf)
            res = compare(
                Q.REGISTRY[name].fn(spark, sf), con, Q.REGISTRY[name].oracle
            )
            con.close()
            print(f"oracle {name} {sf}: ok={res['ok']}")
            if not res["ok"]:
                print(res)
                sys.exit(1)

    arms = {
        "q125_old": q125_old,
        "q125_new": Q.REGISTRY["q125_heavy_hitters"].fn,
        "q126_new": Q.REGISTRY["q126_nb_classifier"].fn,
    }
    for fn in arms.values():  # warm
        with checkpoint_scope(spark):
            fn(spark, SF_DIR).count()
    times = {k: [] for k in arms}
    for rep in range(reps):
        for k, fn in arms.items():
            with checkpoint_scope(spark):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        print(
            k,
            [round(x, 2) for x in v],
            "min",
            round(min(v), 2),
            "max",
            round(max(v), 2),
        )
    spark.stop()


if __name__ == "__main__":
    main()
