"""Gopher repetition metrics — differential vs a pure-Python counter,
hand-pinned edge cases, and the zero-shuffle plan guarantee."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mistral_ocr_app_spark.operators.repetition import (
    dup_gram_char_frac,
    gram_array,
    top_gram_char_frac,
    with_repetition_flags,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_fracs(text: str, n: int) -> tuple[float, float]:
    toks = text.split(" ")
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return 0.0, 0.0
    cnt = Counter(grams)
    denom = sum(c * len(g) for g, c in cnt.items())
    top = max(c * len(g) for g, c in cnt.items())
    dup = sum(c * len(g) for g, c in cnt.items() if c > 1)
    return round(top / denom, 4), round(dup / denom, 4)


HAND_CASES = [
    "a b a b a b",          # one dominant 2-gram
    "x",                    # shorter than n → 0.0 / 0.0
    "x y",                  # single 2-gram occurs once → top=1.0, dup=0.0
    "q q q q q q q q",      # total repetition → both 1.0
    "alpha beta gamma delta epsilon",  # all distinct → dup 0.0
    "aa b aa b cc d cc d aa b",
]


@pytest.mark.parametrize("n", [2, 3])
def test_differential_vs_python(spark, n):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .union(
            spark.createDataFrame(
                [(10_000 + i, t) for i, t in enumerate(HAND_CASES)],
                "doc_id long, text string",
            )
        )
    )
    toks = F.split("text", " ")
    got = {
        r["doc_id"]: (r["top"], r["dup"])
        for r in docs.select(
            "doc_id",
            top_gram_char_frac(toks, n).alias("top"),
            dup_gram_char_frac(toks, n).alias("dup"),
        ).collect()
    }
    for row in docs.collect():
        assert got[row["doc_id"]] == _py_fracs(row["text"], n), (
            row["doc_id"],
            row["text"][:80],
        )


def test_hand_pins(spark):
    df = spark.createDataFrame([(t,) for t in HAND_CASES], "text string")
    toks = F.split("text", " ")
    rows = df.select(
        top_gram_char_frac(toks, 2).alias("top"),
        dup_gram_char_frac(toks, 2).alias("dup"),
    ).collect()
    assert (rows[1]["top"], rows[1]["dup"]) == (0.0, 0.0)  # "x": no 2-grams
    assert (rows[2]["top"], rows[2]["dup"]) == (1.0, 0.0)  # "x y": unique 2-gram
    assert (rows[3]["top"], rows[3]["dup"]) == (1.0, 1.0)  # "q q q ...": all same
    assert rows[4]["dup"] == 0.0  # all distinct


def test_gram_array_short_doc_is_empty(spark):
    # sequence(0, -k) counts DOWN in Spark — the guard must kick in
    df = spark.createDataFrame([("a",), ("a b c",)], "text string")
    sizes = df.select(F.size(gram_array(F.split("text", " "), 3)).alias("s")).collect()
    assert [r["s"] for r in sizes] == [0, 1]


def test_fast_path_matches_reference_functions(spark):
    """with_repetition_flags (staged, hashed, single-pass) must agree
    with the standalone reference columns on real + adversarial docs."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .union(
            spark.createDataFrame(
                [(10_000 + i, t) for i, t in enumerate(HAND_CASES)],
                "doc_id long, text string",
            )
        )
    )
    toks = F.split("text", " ")
    ref = docs.select(
        "doc_id",
        top_gram_char_frac(toks, 2).alias("rt"),
        dup_gram_char_frac(toks, 2).alias("rd"),
    )
    fast = with_repetition_flags(docs).select(
        "doc_id", "top2gram_frac", "dup2gram_frac", "repetition_pass"
    )
    joined = {r["doc_id"]: r for r in fast.join(ref, "doc_id").collect()}
    for r in joined.values():
        assert (r["top2gram_frac"], r["dup2gram_frac"]) == (r["rt"], r["rd"]), r


def test_repetition_projection_is_shuffle_free_and_single_pass(spark):
    """The whole point vs the explode→groupBy shape: per-doc metrics
    must not exchange — the plan is scan → project, no shuffle. And
    the staged derive must keep ONE aggregate scan for all three
    outputs (CollapseProject must not inline the _rep struct)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = with_repetition_flags(docs).select(
        "doc_id", "top2gram_frac", "dup2gram_frac", "repetition_pass"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("array_sort") == 1, plan.count("array_sort")
    # the per-token hash array is materialized once, not per gram
    assert plan.count("xxhash64") == 1, plan.count("xxhash64")
