"""Sources/sinks roundtrip (SURVEY §2.1 S1/S8/S9/S10)."""

import json

from mistral_ocr_app_spark.operators.assemble import assemble_conversations
from mistral_ocr_app_spark.operators.extract import extract_turns
from mistral_ocr_app_spark.sources.io import (
    read_transcripts,
    write_json_sink,
    write_markdown_sink,
    write_turns,
)


def test_schema_pinned_scan(spark, fixture_paths):
    df = read_transcripts(spark, fixture_paths["transcripts"])
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    assert df.schema["turn_idx"].dataType.simpleString() == "int"


def test_sink_roundtrips(spark, fixture_paths, tmp_path):
    transcripts = read_transcripts(spark, fixture_paths["transcripts"])
    extracted = extract_turns(transcripts)
    n = extracted.count()

    write_turns(extracted, str(tmp_path / "turns"), partition_cols=["kind"])
    back = spark.read.parquet(str(tmp_path / "turns"))
    assert back.count() == n
    assert set(back.columns) == set(extracted.columns)

    assembled = assemble_conversations(extracted)
    write_markdown_sink(assembled, str(tmp_path / "md"))
    md = spark.read.parquet(str(tmp_path / "md"))
    assert md.columns == ["conv_id", "combined_app"]
    assert md.count() == assembled.count()

    write_json_sink(extracted, str(tmp_path / "json"))
    lines = spark.read.text(str(tmp_path / "json"))
    assert lines.count() == n
    rec = json.loads(lines.first()["value"])
    assert "extracted_text" not in rec  # payload-dropping projection
    assert {"conv_id", "turn_idx", "kind", "n_chars"} <= set(rec)
