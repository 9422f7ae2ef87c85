"""Structured Streaming surface (SURVEY §2.10).

The reference is fully synchronous request/response (app.py:854-949); its
closest streaming analogs are the upload-progress events
(templates/index.html:475-487) and the append-only audit log
(settings_manager.py:28-41). The north rule makes monitoring first-class:
these jobs give the engine a continuous-ingest path over the same
transcripts schema, with watermarked event-time windows for late data.

Not part of the correctness gate (BASELINE.json); exercised by
tests/test_streaming.py with an availableNow trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_turns
from ..sources.io import TRANSCRIPT_SCHEMA  # one schema for batch + stream


def turn_rate_stream(
    spark: SparkSession,
    transcripts_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time throughput metrics: turns per (window, role), tolerating
    late arrivals up to the watermark (T2/T4)."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(transcripts_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )


def extract_stream(spark: SparkSession, transcripts_dir: str) -> DataFrame:
    """Continuous extraction: the same vectorized extractor
    (operators/extract.py) applied to a stream — mapInPandas is
    streaming-compatible, so batch and streaming share one code path."""
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(transcripts_dir)
    return extract_turns(stream)


_PROGRESS_OUT = (
    "conv_id string, n_turns_seen long, max_turn_idx int, "
    "n_chars long, n_batches int"
)
_PROGRESS_STATE = "n_turns_seen long, max_turn_idx int, n_chars long, n_batches int"


def conversation_progress_stream(
    spark: SparkSession,
    transcripts_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): running
    per-conversation progress — turns seen, highest turn_idx, chars,
    micro-batches contributing — carried across micro-batches in the
    state store. The streaming analog of the reference's incremental
    ``total_images +=`` / progress-event accounting (app.py:611-630,
    templates/index.html:475-487), upgraded to fault-tolerant keyed
    state. Arrow-batched per group; no per-row Python."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(transcripts_dir)

    def update(key, pdfs, state):
        import pandas as pd

        n, mx, ch, nb = state.get if state.exists else (0, -1, 0, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
                ch += int(pdf["text"].fillna("").str.len().sum())
        nb += 1
        state.update((n, mx, ch, nb))
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_turns_seen": n,
                    "max_turn_idx": mx,
                    "n_chars": ch,
                    "n_batches": nb,
                }
            ]
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=_PROGRESS_OUT,
        stateStructType=_PROGRESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
