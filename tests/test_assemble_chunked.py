"""Chunked (skew-bounded) assembly: identical output to the flat
single-exchange assembly; gapped-turn_idx header contract pinned to the
reference's page.get('index')+1 numbering (app.py:820)."""

import pandas as pd
from pyspark.sql import functions as F

from mistral_ocr_app_spark.operators.assemble import (
    assemble_auto,
    assemble_conversations,
    assemble_conversations_chunked,
)
from mistral_ocr_app_spark.operators.extract import extract_turns
from mistral_ocr_app_spark.sources.io import read_transcripts


def _sorted_pdf(df) -> pd.DataFrame:
    return (
        df.select("conv_id", "n_turns", "combined_app", "combined_cli")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def test_chunked_equals_flat_on_fixture_corpus(spark, fixture_paths):
    ex = extract_turns(read_transcripts(spark, fixture_paths["transcripts"]))
    flat = _sorted_pdf(assemble_conversations(ex))
    # chunk_size far below the heavy-conv length → real multi-chunk paths
    chunked = _sorted_pdf(assemble_conversations_chunked(ex, chunk_size=16))
    pd.testing.assert_frame_equal(flat, chunked)


def test_chunked_handles_pathological_conversation(spark):
    """A 100k-turn conversation (the executor-OOM scenario for a single
    collect_list buffer) assembles correctly and identically to flat."""
    n = 100_000
    turns = spark.range(n).select(
        F.lit("conv-huge").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.concat(F.lit("turn text "), F.col("id")).alias("extracted_text"),
    )
    out = assemble_conversations_chunked(turns, chunk_size=1024)
    row = out.first()
    assert row["n_turns"] == n
    assert row["combined_app"].startswith("# Страница 1\n\nturn text 0")
    assert row["combined_app"].endswith(f"# Страница {n}\n\nturn text {n-1}")
    # spot-check against flat on a slice boundary (full flat comparison
    # is what the fixture-corpus test covers)
    flat_head = (
        assemble_conversations(turns.filter(F.col("turn_idx") < 2048))
        .first()["combined_app"]
    )
    assert row["combined_app"].startswith(flat_head)


def test_chunked_equals_flat_on_random_gapped_conversations(spark):
    """Seeded-random conversations with gapped/sparse turn_idx, empty and
    unicode texts, across several chunk sizes — chunked must equal flat."""
    import random

    rng = random.Random(1234)
    rows = []
    for c in range(30):
        idxs = sorted(rng.sample(range(0, 500), rng.randint(1, 40)))
        for i in idxs:
            text = rng.choice(["", "short", "слово " * rng.randint(0, 5), f"t{i}"])
            rows.append((f"conv-{c:03d}", i, text))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string"
    )
    flat = _sorted_pdf(assemble_conversations(df))
    for chunk_size in (1, 7, 64, 10_000):
        chunked = _sorted_pdf(assemble_conversations_chunked(df, chunk_size))
        pd.testing.assert_frame_equal(flat, chunked)
    # auto-routing at thresholds that split the corpus every way —
    # all-flat, mixed, all-chunked — must also be output-identical
    for threshold in (0, 10, 25, 1_000):
        auto = _sorted_pdf(assemble_auto(df, threshold_turns=threshold,
                                         chunk_size=7))
        pd.testing.assert_frame_equal(flat, auto)


def test_auto_routes_heavy_convs_to_chunked(spark):
    """The heavy conversation takes the chunked branch (its chunk agg
    appears in the plan and the light/flat branch excludes it), while
    output stays identical to flat."""
    rows = [("light", i, f"l{i}") for i in range(10)]
    rows += [("heavy", i, f"h{i}") for i in range(200)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, extracted_text string"
    )
    auto = assemble_auto(df, threshold_turns=100, chunk_size=16)
    pd.testing.assert_frame_equal(
        _sorted_pdf(assemble_conversations(df)), _sorted_pdf(auto)
    )
    plan = auto._jdf.queryExecution().optimizedPlan().toString()
    # both shapes present: a chunk-keyed aggregate (chunked branch) and
    # the broadcast-routed anti/semi joins
    assert "FLOOR" in plan.upper() and "floor" in plan.lower()
    assert plan.count("Join LeftAnti") == 1, plan
    assert plan.count("Join LeftSemi") == 1, plan


def test_gapped_turn_idx_headers_match_reference_semantics(spark):
    """app.py:820 numbers by the page's own index field (+1), not by
    position — gapped turn_idx must yield gapped headers."""
    turns = spark.createDataFrame(
        [("c", 0, "a"), ("c", 2, "b"), ("c", 5, "c")],
        "conv_id string, turn_idx int, extracted_text string",
    )
    for df in (
        assemble_conversations(turns),
        assemble_conversations_chunked(turns, chunk_size=2),
    ):
        combined = df.first()["combined_app"]
        assert (
            combined
            == "# Страница 1\n\na\n\n---\n\n# Страница 3\n\nb\n\n---\n\n# Страница 6\n\nc"
        )
