"""Deterministic sampling / global shuffle — Python-hash differential,
partitioning-invariance, and order pins."""

import hashlib

from pyspark.sql import functions as F

from mistral_ocr_app_spark.operators.corpus import P_HASH
from mistral_ocr_app_spark.operators.sampling import (
    deterministic_sample,
    global_shuffle,
    keyed_hash,
    sample_flag,
    shuffle_bucket,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_hash(seed: str, key) -> int:
    hx = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
    return int(hx[:15], 16) % P_HASH


def test_keyed_hash_matches_python(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", keyed_hash(F.col("doc_id"), "7").alias("h")).collect()
    }
    for k, v in got.items():
        assert v == _py_hash("7", k), k


def test_membership_is_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.25, seed="7").select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs.repartition(13), 0.25, seed="7")
        .select("doc_id")
        .collect()
    }
    assert a == b
    # exact membership = python predicate
    expect = {
        r["doc_id"]
        for r in docs.select("doc_id").collect()
        if _py_hash("7", r["doc_id"]) < int(0.25 * P_HASH)
    }
    assert a == expect
    # a real fraction, and seed-sensitive
    n = docs.count()
    assert 0.15 * n < len(a) < 0.35 * n
    c = {r["doc_id"] for r in deterministic_sample(docs, 0.25, seed="8").select("doc_id").collect()}
    assert c != a


def test_stratified_fractions(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    frac = {"en": 0.5, "es": 0.1}
    got = {
        r["doc_id"]
        for r in stratified_sample(docs, frac, "lang", seed="q").select("doc_id").collect()
    }
    expect = {
        r["doc_id"]
        for r in docs.select("doc_id", "lang").collect()
        if r["lang"] in frac and _py_hash("q", r["doc_id"]) < int(frac[r["lang"]] * P_HASH)
    }
    assert got == expect and got


def test_global_shuffle_total_order(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    got = [r["doc_id"] for r in global_shuffle(docs, "doc_id", seed="s").collect()]
    expect = sorted(
        (r["doc_id"] for r in docs.collect()),
        key=lambda k: (_py_hash("s", k), k),
    )
    assert got == expect
    assert got != sorted(got)  # it IS shuffled
    # sharded variant: shard i holds the i-th contiguous slice
    sharded = global_shuffle(docs, "doc_id", seed="s", partitions=4)
    flat = [
        k
        for part in sharded.rdd.glom().collect()
        for k in (r["doc_id"] for r in part)
    ]
    assert flat == expect


def test_bucket_range(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = docs.select(shuffle_bucket(F.col("doc_id"), 16).alias("b")).distinct().collect()
    got = {r["b"] for r in rows}
    assert got <= set(range(16)) and len(got) == 16


def test_sample_filter_pushes_down(spark):
    """The predicate is a pure column function — it must reach the scan
    as a data filter (no shuffle, no rand-style project barrier)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        deterministic_sample(docs, 0.25, seed="7")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
