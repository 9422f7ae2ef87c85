"""V6/V7 surfaces (operators/udxf.py): each must be value-identical to
the production relational path it mirrors."""

import pandas as pd
from pyspark.sql import functions as F

from mistral_ocr_app_spark.operators.extract import exploded_spans, extract_turns
from mistral_ocr_app_spark.operators.udxf import (
    exploded_spans_via_udtf,
    success_rate_agg,
)

SORT = ["conv_id", "turn_idx", "page", "span_idx"]


def test_udtf_lateral_equals_posexplode_path(spark, fixture_paths):
    t = spark.read.parquet(fixture_paths["transcripts"])
    prod = (
        exploded_spans(t).toPandas().sort_values(SORT).reset_index(drop=True)
    )
    alt = (
        exploded_spans_via_udtf(spark, t)
        .toPandas()
        .sort_values(SORT)
        .reset_index(drop=True)[prod.columns.tolist()]
    )
    assert len(prod) > 0  # fixture must exercise the span path
    pd.testing.assert_frame_equal(prod, alt)


def test_grouped_agg_udaf_equals_builtin_avg(spark, fixture_paths):
    ex = extract_turns(spark.read.parquet(fixture_paths["transcripts"]))
    valid_d = F.col("valid").cast("double")
    builtin = (
        ex.groupBy("conv_id")
        .agg(F.avg(valid_d).alias("rate"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    udaf = (
        ex.groupBy("conv_id")
        .agg(success_rate_agg(valid_d).alias("rate"))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(builtin, udaf)
