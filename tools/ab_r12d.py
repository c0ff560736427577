"""Round-12 A/B, part 4: per-round corpus barrier in _bpe_rounds
(q129 bpe_merges / q139 bpe_apply).

Old shape: `cur` (the corpus-sized padded-string column) is rebuilt
lazily each round — every consumer of round k's corpus re-runs the
scan + tokenize + k replace layers. New shape (applied in textual.py):
`cur` is localCheckpoint(eager=True) per round, so each round's
transform runs exactly once (r11 A/B'd eager barriers on the 1-row
`best` frames and LOST; this is the corpus column instead).

Interleaved A/B in one warmed session; oracle gate at sf0.01+sf0.001
runs first (any mismatch aborts).

Usage: python tools/ab_r12d.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.operators.textual import spread, tokens
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def _bpe_rounds_old(cur: DataFrame, id_col: str, n_merges: int, joiner: str):
    """Pre-r12 loop: no per-round corpus barrier."""
    results = []
    for k in range(1, n_merges + 1):
        toks = F.filter(F.split("__t", " "), lambda t: t != "")
        pairs = cur.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.struct(
                            F.element_at(toks, i.cast("int")).alias("w1"),
                            F.element_at(toks, (i + 1).cast("int")).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
            ).alias("p")
        ).select("p.w1", "p.w2")
        best = (
            pairs.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .withColumn("merge_idx", F.lit(k))
        )
        results.append(best.select("merge_idx", "w1", "w2", "cnt"))
        pat = F.concat(F.lit(" "), F.col("w1"), F.lit(" "), F.col("w2"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.col("w1"), F.lit(joiner), F.col("w2"), F.lit(" ")
        )
        merged = F.col("__t")
        for _ in range(3):
            merged = F.replace(merged, pat, rep)
        cur = (
            cur.crossJoin(F.broadcast(best.select("w1", "w2")))
            .select(F.col(id_col), merged.alias("__t"))
        )
    return results, cur


def q129_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Q._t(spark, sf_dir, "documents")
    cur = spread(docs.select("doc_id", "text"), "doc_id").select(
        F.col("doc_id"),
        F.concat(
            F.lit(" "), F.concat_ws(" ", tokens(F.col("text"))), F.lit(" ")
        ).alias("__t"),
    )
    results, _ = _bpe_rounds_old(cur, "doc_id", 3, "~")
    out = results[0]
    for r in results[1:]:
        out = out.unionAll(r)
    return out


def q139_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Q._t(spark, sf_dir, "documents")
    cur = spread(docs.select("doc_id", "text"), "doc_id").select(
        F.col("doc_id"),
        F.concat(
            F.lit(" "), F.concat_ws(" ", tokens(F.col("text"))), F.lit(" ")
        ).alias("__t"),
    )
    _, final = _bpe_rounds_old(cur, "doc_id", 3, "~")
    n_of = lambda c: F.size(F.filter(F.split(c, " "), lambda t: t != ""))
    before = cur.select(
        F.col("doc_id"), n_of("__t").cast("bigint").alias("n_syms_before")
    )
    after = final.select(
        F.col("doc_id"), n_of("__t").cast("bigint").alias("n_syms_after")
    )
    return before.join(after, "doc_id").select(
        F.col("doc_id"),
        "n_syms_before",
        "n_syms_after",
        F.round(
            F.col("n_syms_after") / F.greatest("n_syms_before", F.lit(1)), 6
        ).alias("compression"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r12d", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tests.oracle_compare import compare, duckdb_connect

    for qname in ("q129_bpe_merges", "q139_bpe_apply"):
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
            con = duckdb_connect(sf)
            res = compare(
                Q.REGISTRY[qname].fn(spark, sf), con, Q.REGISTRY[qname].oracle
            )
            con.close()
            print(f"oracle {qname} {sf}: ok={res['ok']}")
            if not res["ok"]:
                print(res)
                sys.exit(1)

    arms = {
        "q129_old": q129_old,
        "q129_new": Q.REGISTRY["q129_bpe_merges"].fn,
        "q139_old": q139_old,
        "q139_new": Q.REGISTRY["q139_bpe_apply"].fn,
    }
    for fn in arms.values():  # warm all
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
        print(k, [round(x, 2) for x in v], "min", round(min(v), 2))
    spark.stop()


if __name__ == "__main__":
    main()
