"""Kill/resume property tests (SURVEY §5 step 3): a job killed after k
bucket commits resumes to a byte-identical table without re-extracting
committed buckets."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mistral_ocr_app_spark.plans.lineage import (
    committed_buckets,
    run_extraction_with_lineage,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def outputs(spark, fixture_paths, tmp_path_factory):
    base = tmp_path_factory.mktemp("lineage")
    oneshot = str(base / "oneshot")
    resumed = str(base / "resumed")
    stats_full = run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], oneshot, n_buckets=N_BUCKETS
    )
    # killed run: commit only 3 buckets, then resume
    stats_partial = run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], resumed, n_buckets=N_BUCKETS,
        fail_after_buckets=3,
    )
    stats_resume = run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], resumed, n_buckets=N_BUCKETS
    )
    return oneshot, resumed, stats_full, stats_partial, stats_resume


def _table(spark, out_dir) -> pd.DataFrame:
    return (
        spark.read.parquet(f"{out_dir}/data")
        .select("conv_id", "turn_idx", "kind", "extracted_text", "bucket")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_resume_produces_identical_table(spark, outputs):
    oneshot, resumed, *_ = outputs
    pd.testing.assert_frame_equal(_table(spark, oneshot), _table(spark, resumed))


def test_resume_skips_committed_buckets(outputs):
    _, _, stats_full, stats_partial, stats_resume = outputs
    assert stats_full["n_pending"] == N_BUCKETS
    assert stats_partial["n_committed_now"] == 3
    assert stats_resume["n_committed_before"] == 3
    assert stats_resume["n_pending"] == N_BUCKETS - 3


def test_rerun_is_noop(spark, fixture_paths, outputs):
    oneshot, *_ = outputs
    stats = run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], oneshot, n_buckets=N_BUCKETS
    )
    assert stats["n_pending"] == 0 and stats["n_committed_before"] == N_BUCKETS


def test_fingerprints_match_between_runs(spark, outputs):
    oneshot, resumed, *_ = outputs
    fp1 = (
        spark.read.parquet(f"{oneshot}/_lineage")
        .select("bucket", "fingerprint", "n_turns")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    fp2 = (
        spark.read.parquet(f"{resumed}/_lineage")
        .select("bucket", "fingerprint", "n_turns")
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fp1, fp2)


def test_lineage_has_one_row_per_bucket(spark, outputs):
    oneshot, resumed, *_ = outputs
    for out in (oneshot, resumed):
        lin = spark.read.parquet(f"{out}/_lineage")
        assert lin.count() == N_BUCKETS
        assert lin.select("bucket").distinct().count() == N_BUCKETS
        assert committed_buckets(spark, f"{out}/_lineage") == sorted(
            r["bucket"] for r in lin.select("bucket").collect()
        )


def test_resume_filter_is_left_anti_join(spark, fixture_paths, outputs):
    """The resume plan must be a broadcast LEFT ANTI against the lineage
    relation, not a literal IN-list (which grows with committed buckets
    and is the wrong shape at 4096+ buckets)."""
    from mistral_ocr_app_spark.plans.lineage import pending_transcripts

    oneshot, *_ = outputs
    pending = pending_transcripts(
        spark, fixture_paths["transcripts"], f"{oneshot}/_lineage", N_BUCKETS
    )
    plan = pending._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert " IN (" not in plan and " INSET " not in plan
    assert pending.count() == 0  # everything committed → nothing pending


def test_reread_filter_prunes_partitions(spark, outputs):
    """The post-write re-read (fingerprint source) must reach the scan as
    a partition filter — directories of committed buckets are skipped,
    not read-then-filtered."""
    from pyspark.sql import functions as F

    oneshot, *_ = outputs
    df = spark.read.parquet(f"{oneshot}/data").filter(F.col("bucket").isin([1, 3]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "bucket" in pf and "IN" in pf.upper()


def test_mid_write_crash_leaves_recoverable_state(spark, fixture_paths, tmp_path):
    """A kill DURING a bucket's data write leaves partial files but no
    lineage row; the resume must overwrite the partial bucket (dynamic
    partition overwrite) and converge to the one-shot table."""
    out = str(tmp_path / "crashy")
    # commit 2 of 8 buckets, then fake a crash mid-write of bucket 5:
    # stale/partial parquet exists in the data dir without a lineage row
    run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], out, n_buckets=N_BUCKETS,
        fail_after_buckets=2,
    )
    import os

    import pandas as pd  # partial garbage row pretending to be bucket 5

    partial_dir = f"{out}/data/bucket=5"
    os.makedirs(partial_dir, exist_ok=True)
    pd.DataFrame(
        {
            "conv_id": ["GARBAGE"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"], "ts": pd.to_datetime(["2020-01-01"]).astype("datetime64[us]"),
            "kind": ["markdown"], "extracted_text": ["PARTIAL WRITE"],
            "n_refs": pd.array([0], dtype="int32"),
            "n_images": pd.array([0], dtype="int32"),
            "n_rewritten": pd.array([0], dtype="int32"),
            "n_spans": pd.array([0], dtype="int32"), "valid": [True],
        }
    ).to_parquet(f"{partial_dir}/part-junk.parquet", index=False)
    assert spark.read.parquet(f"{out}/data").filter("conv_id = 'GARBAGE'").count() == 1

    stats = run_extraction_with_lineage(
        spark, fixture_paths["transcripts"], out, n_buckets=N_BUCKETS
    )
    assert stats["n_pending"] == N_BUCKETS - 2
    final = spark.read.parquet(f"{out}/data")
    assert final.filter("conv_id = 'GARBAGE'").count() == 0  # partial gone
    got = (
        final.select("conv_id", "turn_idx", "extracted_text")
        .toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    gold = (
        pd.read_parquet(fixture_paths["golden_turns"])
        [["conv_id", "turn_idx", "extracted_text"]]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, gold, check_dtype=False)


def test_extraction_output_matches_golden_via_lineage_path(spark, outputs, fixture_paths):
    oneshot, *_ = outputs
    got = _table(spark, oneshot)[["conv_id", "turn_idx", "extracted_text"]]
    gold = (
        pd.read_parquet(fixture_paths["golden_turns"])
        [["conv_id", "turn_idx", "extracted_text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, gold, check_dtype=False)


def test_verify_lineage_clean_and_corrupted(spark, outputs):
    """Fingerprint audit: clean output verifies empty; corrupting one
    bucket's data (extra row) flags exactly that bucket."""
    from mistral_ocr_app_spark.plans.lineage import verify_lineage

    oneshot, *_ = outputs
    assert verify_lineage(spark, oneshot).count() == 0

    import glob
    import shutil

    import pandas as pd

    corrupt = str(oneshot) + "_corrupt"
    shutil.copytree(oneshot, corrupt)
    victim = sorted(glob.glob(f"{corrupt}/data/bucket=*"))[0]
    bucket_id = int(victim.rsplit("=", 1)[1])
    pd.DataFrame(
        {
            "conv_id": ["INJECTED"], "turn_idx": pd.array([0], dtype="int32"),
            "role": ["user"], "ts": pd.to_datetime(["2020-01-01"]).astype("datetime64[us]"),
            "kind": ["markdown"], "extracted_text": ["tampered"],
            "n_refs": pd.array([0], dtype="int32"),
            "n_images": pd.array([0], dtype="int32"),
            "n_rewritten": pd.array([0], dtype="int32"),
            "n_spans": pd.array([0], dtype="int32"), "valid": [True],
        }
    ).to_parquet(f"{victim}/part-injected.parquet", index=False)
    bad = verify_lineage(spark, corrupt).collect()
    assert [r["bucket"] for r in bad] == [bucket_id]
    assert bad[0]["actual_n_turns"] == bad[0]["n_turns"] + 1
