"""sf0.1 smoke runs for the queries whose failure modes are
SCALE-DEPENDENT — iterative algorithms whose round counts grow with
data (r03's q171 passed every sf0.01 check and crashed only at the
bench scale factor) and the heaviest bench queries.

Marked ``slow``: excluded from the default `pytest tests/ -q` loop
(see conftest), run explicitly before committing bench-affecting
changes:

    python -m pytest tests/test_scale_smoke.py -q --run-slow
"""

from __future__ import annotations

import pytest

from tytodb_spark import queries as Q

SF_BENCH = "/root/testdata/sf0.1"

# iterative round-count-sensitive + the slowest bench entries
SCALE_SENSITIVE = [
    "q71_near_dup_clusters",
    "q124_dup_graph_pagerank",
    "q168_power_iteration",
    "q171_incremental_cc",
    "q112_star_clusters",
    "q136_stream_incremental_rollup",
    "q139_bpe_apply",
    "q166_pipeline_funnel",
    "q172_stream_heavy_hitters",
    "q192_cluster_stats",
    "q193_stream_dedup",
    # round 5: the pair-finding / fan-out additions whose candidate
    # volume is fixture-structure-dependent (q207's first spelling
    # passed sf0.01 and took 120 s at the bench SF)
    "q206_sparse_cosine_pairs",
    "q207_phash_near_dups",
    "q208_contamination_depth",
    "q210_multimodal_dedup_audit",
    "q215_kcore",
    # round 5b: co-supply pair fan-out, 6-way unpivot + per-column ndv,
    # and the per-distinct-value CDF table — all fixture-structure-
    # dependent volumes
    "q222_adamic_adar",
    "q224_encoding_advisor",
    "q225_percent_rank_dist",
    "q234_source_fingerprint_matrix",  # 64x seed explode over shingles
    # round 6: pair fan-outs whose candidate volume depends on fixture
    # structure (basket sizes, grid density, bigram vocabulary, blocks)
    "q243_market_basket",
    "q245_record_linkage",
    "q246_grid_spatial_join",
    "q247_kneser_ney",
    "q249_theil_sen",
    "q257_rare_token_mass",
    "q264_lsh_tuning",  # 3 bandings x band-bucket pair fan-out
    "q272_split_leakage",  # cross-split gram join volume
    # round 7: the iterative fixpoint loop (level count = key depth),
    # the probe x corpus brute-force audit, the (doc, gram) repeat
    # census, and the streaming session-merge drain — all volumes
    # fixture-structure-dependent
    "q277_recursive_closure",
    "q283_sq8_recall",
    "q288_ngram_loops",
    "q286_stream_sessionize",
    "q285_markov_removal",
    "q311_hubness_audit",  # query-sample x corpus pair volume
    "q314_modularity",  # co-supply pair fan-out
    "q315_gsp_support",  # per-user activity^2 existence join
    # round 8: panel x corpus fan-outs, chained corpus passes, per-order
    # pair fan-out, gram-volume distinct — all fixture-structure-
    # dependent volumes
    "q353_facility_location",  # 16-candidate x corpus sims, 4 passes
    "q370_pca_power_iteration",  # 4 chained corpus passes
    "q378_triangle_count",  # per-order pair fan-out + wedge join
    "q360_distinct_n_diversity",  # 1/2/3-gram distinct volume
    "q371_conditional_entropy",  # bigram vocabulary volume
    "q377_trending_terms",  # full-vocabulary fold ranking
    # round 9: per-order/per-customer pair fan-outs (basket sizes and
    # brand counts are fixture-structure-dependent), the co-supply
    # edge-generation fan-out (C(suppliers_per_part,2) per part, feeds
    # 3 join iterations), and the Q9-shape fact-fact exchange
    "q411_market_basket",
    "q412_butterfly_count",
    "q413_pagerank_cosupply",
    "q414_item_item_cf",
    "q399_product_profit",
    "q422_skipgram_pairs",  # per-doc positional fan-out, vocab volume
    "q431_triplet_margin",  # anchor-panel x corpus sim volume
    "q432_containment_pairs",  # inverted-index pair fan-out
    "q436_edge_support",  # triangle-volume explode
    "q437_cf_holdout_eval",  # scoring fan-out x user top-5
    "q439_rake_keyphrases",  # phrase-run volume, per-doc windows
    "q441_bigram_next_token",  # positional fan-out, vocab volume
    "q447_heaps_law",  # shingle-type first-occurrence volume
    # round 9 (this session): the pair/fan-out additions whose volume
    # is fixture-structure-dependent — co-supply wedge closes (q466),
    # degree-gated pair aggregates (q467), customer x brand pair dots
    # (q468/q469), the dim^2-per-row Gram explode (q473), the token
    # frequency-spectrum explode (q471), and the per-user order-
    # statistic fan-out (q484)
    "q466_local_clustering",
    "q467_link_prediction",
    "q468_rec_coverage",
    "q469_intra_list_diversity",
    "q471_good_turing",
    "q473_participation_ratio",
    "q484_best_of_n",
    # round 10: the dedup-funnel composition (LSH pair fan-out over the
    # exact-survivor set is fixture-structure-dependent)
    "q514_dedup_storage_savings",
]


@pytest.mark.slow
@pytest.mark.parametrize("name", [n for n in SCALE_SENSITIVE if n in Q.REGISTRY])
def test_runs_at_bench_sf(spark, name):
    df = Q.REGISTRY[name].fn(spark, SF_BENCH)
    assert df.count() >= 0  # completes without raising at the bench SF


@pytest.mark.slow
def test_degree_gate_survives_hot_part_skew(spark, tmp_path):
    """The 100x question for the co-supply graph family (q222/q466/
    q467): their pair fan-out bound is the `n_supp BETWEEN 2 AND 32`
    gate. Salt sf0.1 with ONE part supplied by 500 suppliers — an
    ungated plan would enumerate C(500,2) = 124,750 extra pairs from
    that part alone (and a real skewed corpus would melt a straggler
    executor); the gate must drop the hot part entirely, so every
    query's output on the salted corpus must EQUAL its clean-corpus
    output row-for-row."""
    import os

    from pyspark.sql import functions as F

    from tytodb_spark.catalog import TABLES, table_path

    skew_dir = tmp_path / "skew"
    skew_dir.mkdir()
    for t in TABLES:
        src = table_path(SF_BENCH, t)
        if t != "lineitem" and os.path.exists(src):
            os.symlink(src, skew_dir / f"{t}.parquet")

    li = spark.read.parquet(table_path(SF_BENCH, "lineitem"))
    hot_part = li.agg(F.max("l_partkey") + 1).collect()[0][0]
    hot = (
        li.limit(500)
        .withColumn("l_partkey", F.lit(hot_part).cast("bigint"))
        .withColumn(
            "l_suppkey",
            (F.lit(10_000_000) + F.monotonically_increasing_id()).cast(
                "bigint"
            ),
        )
    )
    staged = str(tmp_path / "staged")
    li.unionByName(hot).coalesce(1).write.parquet(staged)
    part_file = next(
        f for f in os.listdir(staged) if f.endswith(".parquet")
    )
    os.rename(
        os.path.join(staged, part_file), skew_dir / "lineitem.parquet"
    )

    # the salt is real: the hot part exceeds the gate by 15x
    ps = (
        spark.read.parquet(str(skew_dir / "lineitem.parquet"))
        .select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .count()
    )
    assert ps.agg(F.max("count")).collect()[0][0] >= 500

    for name in (
        "q222_adamic_adar",
        "q466_local_clustering",
        "q467_link_prediction",
    ):
        clean = sorted(
            map(tuple, Q.REGISTRY[name].fn(spark, SF_BENCH).collect())
        )
        salted = sorted(
            map(tuple, Q.REGISTRY[name].fn(spark, str(skew_dir)).collect())
        )
        assert salted == clean, f"{name}: hot part leaked past the gate"


@pytest.mark.slow
def test_checkpoint_scope_releases_round9_tail_blocks(spark):
    """Runtime twin of test_plans' static `.persist(` guard, extended
    over the round-9 localCheckpoint(eager=False) chains (q436/q466 et
    al.). Finding that motivated it: a SINGLE lazy checkpoint is
    reclaimed by the ContextCleaner once its plan is garbage, but a
    checkpoint whose plan reads another checkpoint (the edge ->
    orientation -> adjacency chains) is NEVER reclaimed — measured
    pinned through 60+ s of explicit driver+JVM GC. Registry-iterating
    drivers therefore release per-query via session.py's
    checkpoint_scope (bench.py and tools/partition_sweep.py both use
    it); this asserts (a) the chains DO pin blocks, and (b) the scope
    returns storage to baseline deterministically — no GC polling."""
    from tytodb_spark.session import checkpoint_scope, persistent_rdd_ids

    base = persistent_rdd_ids(spark)
    pinned_during = 0
    for name in (
        "q378_triangle_count",
        "q436_edge_support",
        "q437_cf_holdout_eval",
        "q466_local_clustering",
    ):
        with checkpoint_scope(spark):
            assert Q.REGISTRY[name].fn(spark, SF_BENCH).count() >= 0
            pinned_during += len(persistent_rdd_ids(spark) - base)
        assert persistent_rdd_ids(spark) <= base, (
            f"{name}: checkpoint blocks survived its scope"
        )
    # the guard is not vacuous: these queries really do pin checkpoints
    assert pinned_during >= 4


@pytest.mark.slow
def test_brand_cf_survives_hot_brand_skew(spark, tmp_path):
    """The 100x question for the brand-CF family (q414/q437/q468/q469):
    their fan-out bound is the 25-value p_brand domain — per-customer
    pair enumeration is C(brands,2) and candidate scoring fans out
    <= |brands| per history row, REGARDLESS of how popular any brand
    is. Salt sf0.1 with one hyper-popular brand bought by EVERY
    customer (one new lineitem row per order-holding customer, a new
    hot part carrying 'Brand#99'): a plan that enumerated pairs per
    interaction row instead of per aggregated (customer, brand) vector
    would blow up on the hot brand; the aggregated shape must keep
    every global pair/candidate table <= C(26,2).

    Assertions: (a) the salt is real — the hot brand reaches every
    order-holding customer; (b) each family query completes with
    output bounded by the 26-brand domain; (c) old-brand pair scores
    are UNCHANGED — a new brand's interactions alter neither the
    counts nor the norms of existing brand vectors, so any (b1,b2)
    pair present in both clean and salted q414 top-15 must carry an
    identical exact dot and cosine."""
    import os

    from pyspark.sql import functions as F

    from tytodb_spark.catalog import TABLES, table_path

    skew_dir = tmp_path / "brandskew"
    skew_dir.mkdir()
    for t in TABLES:
        src = table_path(SF_BENCH, t)
        if t not in ("lineitem", "part") and os.path.exists(src):
            os.symlink(src, skew_dir / f"{t}.parquet")

    p = spark.read.parquet(table_path(SF_BENCH, "part"))
    hot_key = p.agg(F.max("p_partkey") + 1).collect()[0][0]
    hot_part = p.limit(1).withColumn(
        "p_partkey", F.lit(hot_key).cast(p.schema["p_partkey"].dataType.simpleString())
    ).withColumn("p_brand", F.lit("Brand#99"))
    staged_p = str(tmp_path / "staged_part")
    p.unionByName(hot_part).coalesce(1).write.parquet(staged_p)
    os.rename(
        os.path.join(
            staged_p,
            next(f for f in os.listdir(staged_p) if f.endswith(".parquet")),
        ),
        skew_dir / "part.parquet",
    )

    li = spark.read.parquet(table_path(SF_BENCH, "lineitem"))
    o = spark.read.parquet(table_path(SF_BENCH, "orders"))
    first_order = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("l_orderkey")
    )
    tmpl = li.limit(1).drop("l_orderkey", "l_partkey")
    hot_li = (
        first_order.select("l_orderkey")
        .crossJoin(F.broadcast(tmpl))
        .withColumn(
            "l_partkey",
            F.lit(hot_key).cast(li.schema["l_partkey"].dataType.simpleString()),
        )
        .select(*li.columns)
    )
    staged_li = str(tmp_path / "staged_li")
    li.unionByName(hot_li).coalesce(1).write.parquet(staged_li)
    os.rename(
        os.path.join(
            staged_li,
            next(f for f in os.listdir(staged_li) if f.endswith(".parquet")),
        ),
        skew_dir / "lineitem.parquet",
    )

    # (a) the salt is real: every order-holding customer bought it
    sli = spark.read.parquet(str(skew_dir / "lineitem.parquet"))
    n_cust = o.select("o_custkey").distinct().count()
    n_hot = (
        sli.filter(F.col("l_partkey") == hot_key)
        .join(o, sli.l_orderkey == o.o_orderkey)
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert n_hot == n_cust

    # (b) bounded outputs on the salted corpus: 26-brand domain
    q414_clean = Q.REGISTRY["q414_item_item_cf"].fn(spark, SF_BENCH).collect()
    q414_salt = (
        Q.REGISTRY["q414_item_item_cf"].fn(spark, str(skew_dir)).collect()
    )
    assert len(q414_salt) == 15
    brands = {r["b1"] for r in q414_salt} | {r["b2"] for r in q414_salt}
    assert len(brands) <= 26

    r468 = Q.REGISTRY["q468_rec_coverage"].fn(spark, str(skew_dir)).collect()
    assert len(r468) == 1
    assert r468[0]["n_items"] == 26
    assert r468[0]["n_rec_slots"] <= 26 * 3

    r469 = (
        Q.REGISTRY["q469_intra_list_diversity"]
        .fn(spark, str(skew_dir))
        .collect()
    )
    assert 0 < len(r469) <= 26

    r437 = Q.REGISTRY["q437_cf_holdout_eval"].fn(spark, str(skew_dir)).collect()
    assert len(r437) == 1 and r437[0]["n_users"] > 0

    # (c) exact aggregated-vector semantics under the salt: every
    # customer bought the hot brand exactly ONCE, so for any pair
    # (b, Brand#99) dot = sum_ck cnt_b(ck) * 1 = brand b's total
    # interaction count. The salt dominates the top-15 (a brand in
    # every basket correlates with everything — expected), and each
    # hot pair's exact int dot must equal the partner's corpus total;
    # a plan that enumerated per interaction row instead of per
    # aggregated (ck, brand) vector would inflate it.
    assert all(
        "Brand#99" in (r["b1"], r["b2"]) for r in q414_salt
    ), "hot brand failed to dominate the top-15 — salt not real?"
    assert q414_clean != q414_salt  # displacement happened
    sp = spark.read.parquet(str(skew_dir / "part.parquet"))
    brand_tot = {
        r["b"]: r["n"]
        for r in sli.join(
            F.broadcast(sp), sli.l_partkey == sp.p_partkey
        )
        .join(o, sli.l_orderkey == o.o_orderkey)
        .groupBy(F.col("p_brand").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in q414_salt:
        other = r["b1"] if r["b2"] == "Brand#99" else r["b2"]
        assert r["dot"] == brand_tot[other], (
            f"pair ({other}, Brand#99): dot {r['dot']} != brand total "
            f"{brand_tot[other]} — per-row fan-out leaked into the dot"
        )
