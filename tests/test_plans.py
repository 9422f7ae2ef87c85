"""Physical-plan regression tests: the efficiency properties the engine
relies on at 100 TB must be visible in the plan at any scale —
pushdown reaching the parquet scan, small dims broadcast, no shuffle in
the extraction stage, exactly one exchange in assembly."""

from mistral_ocr_app_spark.operators import catalog
from mistral_ocr_app_spark.operators.assemble import assemble_conversations
from mistral_ocr_app_spark.operators.extract import extract_turns
from mistral_ocr_app_spark.sources.io import read_transcripts

SF_DIR = "/root/testdata/sf0.001"
Q = catalog.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushed_to_scan(spark):
    df = Q["s1_scan_project_filter"](spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert "GreaterThan(n_chars,200)" in plan or "n_chars" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    df = Q["s1_scan_project_filter"](spark, SF_DIR)
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # widest column pruned away


def test_join_chain_broadcasts_dims(spark):
    plan = _plan(Q["j3_equi_join_chain"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_semi_anti_join_strategies(spark):
    plan = _plan(Q["j6_semi_anti_membership"](spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_extraction_stage_has_no_shuffle(spark, fixture_paths):
    df = extract_turns(read_transcripts(spark, fixture_paths["transcripts"]))
    plan = _plan(df)
    assert "Exchange" not in plan  # per-turn extraction is narrow


def test_assembly_has_single_exchange_with_partial_agg(spark, fixture_paths):
    df = assemble_conversations(
        extract_turns(read_transcripts(spark, fixture_paths["transcripts"]))
    )
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    # map-side partial aggregation before the exchange
    assert "partial_count" in plan or "ObjectHashAggregate" in plan


def test_assembly_sorts_turn_array_once(spark, fixture_paths):
    """VERDICT r4 item 2: the O(n log n) array_sort must run once per
    group — the agg emits one sorted array and a SEPARATE projection
    derives both joiner variants (CollapseProject must not re-merge the
    projection, which would re-duplicate the sort per output column)."""
    df = assemble_conversations(
        extract_turns(read_transcripts(spark, fixture_paths["transcripts"]))
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("array_sort") == 1
    # the derivation stays a Project over the Aggregate
    assert "Project [conv_id" in optimized.split("Aggregate")[0]


def test_agg_uses_partial_aggregation(spark):
    plan = _plan(Q["a1_counts_per_group"](spark, SF_DIR))
    assert "partial_sum" in plan or "partial_count" in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(Q["o1_multikey_sort_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_in_scalar_queries(spark):
    plan = _plan(Q["x5_translate_normalize"](spark, SF_DIR))
    assert "*(1)" in plan  # WholeStageCodegen stage marker


def test_lsh_self_join_is_sort_merge_not_broadcast(spark):
    """d4's band⋈band pair self-joins must stay sort-merge joins: under
    small local stats Catalyst would broadcast the UNBOUNDED band-row
    relation — a plan shape that cannot exist at 10^12 scale — and
    re-evaluate the minhash subtree on both sides. Broadcasts are
    allowed only for the LeftSemi/LeftAnti heavy-bucket splits on the
    size-bounded heavy-key relation (grid salting) and for the
    STATS-DRIVEN inner attach joins of the round-7 grouped expansion
    (chunk metadata / member-chunk relations, keyed on gid/chunk — no
    hint forces those, so at scale Catalyst degrades them to shuffle
    joins on the same keys with an unchanged pair set)."""
    plan = _plan(Q["d4_minhash_lsh_candidates"](spark, SF_DIR))
    assert "SortMergeJoin" in plan
    for line in plan.splitlines():
        if "BroadcastHashJoin" in line and "LeftSemi" not in line \
                and "LeftAnti" not in line:
            # inner broadcasts may only key on the expansion attach
            # columns, never on the pair-join's (band, bucket)
            assert "band" not in line and "bucket" not in line, line
    # neither pair join (light plain, heavy lattice) fell back to broadcast
    assert plan.count("SortMergeJoin") == 2


def test_bucketed_join_is_shuffle_free(spark, fixture_paths):
    """SURVEY §4.3 co-location: two tables bucketed on conv_id with equal
    bucket counts must join WITHOUT any exchange — the scan satisfies
    the distribution. This is the one-time-write / many-free-joins
    trade that matters at 100 TB."""
    import shutil

    from pyspark.sql import functions as F

    from mistral_ocr_app_spark.sources.io import write_turns_bucketed

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bt_turns", "bt_stats", "bt_test"):
        # a previous session's managed-table dir survives the in-memory
        # catalog; saveAsTable refuses to reuse the location
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)

    ex = extract_turns(read_transcripts(spark, fixture_paths["transcripts"]))
    write_turns_bucketed(ex.select("conv_id", "turn_idx", "kind"), "bt_turns", 8)
    write_turns_bucketed(
        ex.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")), "bt_stats", 8
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_turns").join(spark.table("bt_stats"), "conv_id")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketed scans satisfy distribution
        assert j.count() == ex.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bt_turns")
        spark.sql("DROP TABLE IF EXISTS bt_stats")


def test_salted_repartition_spreads_heavy_conv_and_preserves_results(
    spark, fixture_paths
):
    """conv_id-salted repartition (SURVEY §4.3): a pathological
    conversation must spread across multiple partitions, and salting
    must not change extraction output."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mistral_ocr_app_spark.operators.extract import salted_repartition

    t = read_transcripts(spark, fixture_paths["transcripts"])
    heavy = t.groupBy("conv_id").count().orderBy(F.desc("count")).first()["conv_id"]
    salted = salted_repartition(t, 16, salt=8)
    n_parts = (
        salted.filter(F.col("conv_id") == heavy)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert n_parts >= 2
    got = (
        extract_turns(salted)
        .select("conv_id", "turn_idx", "extracted_text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    gold = (
        pd.read_parquet(fixture_paths["golden_turns"])
        [["conv_id", "turn_idx", "extracted_text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, gold, check_dtype=False)


def test_substring_dedup_joins_are_sort_merge_not_broadcast(spark):
    """Both joins in the substring-dedup rollup sit on corpus-sized
    derived relations (per-hash stats, per-doc rollup): under small
    local stats Catalyst broadcasts them — a shape that cannot exist at
    10^12 windows. The merge hints must hold them at sort-merge, where
    AQE skew-join can split hot window hashes (ubiquitous boilerplate)."""
    from mistral_ocr_app_spark.operators.substring_dedup import (
        duplicate_window_stats,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicate_window_stats(docs, width=10))
    assert "BroadcastHashJoin" not in plan
    assert plan.count("SortMergeJoin") == 2
