"""Context-window packing (pack_turns): hand-case, pandas differential
on the fixture corpus, and the straddle bound (a pack overruns the
budget by at most its final turn). The oracled catalog twin is w4's
pack_id column (same offset-binning semantics over an integer cumsum)."""

import pandas as pd

from mistral_ocr_app_spark.fixtures import write_fixture
from mistral_ocr_app_spark.operators.assemble import pack_turns
from mistral_ocr_app_spark.operators.extract import extract_turns


def test_hand_case(spark):
    rows = [
        ("c", i, " ".join(["t"] * n))
        for i, n in enumerate([2, 2, 2, 4, 1])
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "extracted_text"])
    got = {
        r["turn_idx"]: r["pack_id"]
        for r in pack_turns(df, budget_tokens=5).collect()
    }
    # tokens_before = 0,2,4,6,10 → floor(/5) = 0,0,0,1,2
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2}


def ref_pack(pdf: pd.DataFrame, budget: int) -> pd.Series:
    pdf = pdf.sort_values(["conv_id", "turn_idx"])
    ntok = pdf["extracted_text"].str.split(" ").str.len()
    before = ntok.groupby(pdf["conv_id"]).cumsum() - ntok
    return (before // budget).astype(int)


def test_differential_and_straddle_bound(spark, tmp_path):
    paths = write_fixture(str(tmp_path / "fx"), n_convs=30, seed=11)
    ex = extract_turns(spark.read.parquet(paths["transcripts"]))
    out = pack_turns(ex, budget_tokens=64).toPandas()

    want = ref_pack(out, 64)
    got = out.sort_values(["conv_id", "turn_idx"])["pack_id"]
    assert (got.to_numpy() == want.to_numpy()).all()

    s = out.sort_values(["conv_id", "turn_idx"]).copy()
    s["ntok"] = s["extracted_text"].str.split(" ").str.len()
    per_pack = s.groupby(["conv_id", "pack_id"]).agg(
        total=("ntok", "sum"), last=("ntok", "last")
    )
    # a pack exceeds the budget only via its straddling final turn
    assert (per_pack["total"] < 64 + per_pack["last"]).all()
    # pack ids start at 0 and never decrease in turn order (they may
    # skip ahead when one turn alone spans multiple budgets)
    firsts = s.groupby("conv_id")["pack_id"].first()
    assert (firsts == 0).all()
    diffs = s.groupby("conv_id")["pack_id"].diff().dropna()
    assert (diffs >= 0).all()
