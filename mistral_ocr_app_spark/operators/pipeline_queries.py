"""Flagship extraction pipeline expressed over the driver testdata.

The driver's oracle tables don't include a transcripts table, so these
queries derive one deterministically from ``documents`` (pure column
expressions — same rows in Spark and DuckDB), run the real extraction
engine on it, and — because the derived payload shapes are controlled —
give the extractor a true SQL oracle:

  variant 0 (doc_id%4==0): text wrapped in HTML with a nav boilerplate
      block → engine must strip to the bare text (or '' below the
      10-word density threshold)
  variant 1: a trailing ``![fig](img-0.jpeg)`` ref → engine must rewrite
      it to ``/image/page_{turn_idx}_extracted_img-0_jpeg.jpeg``
      (app.py:64-115 semantics)
  variant 2: plain text → identity
  variant 3: a span-source document in the ``tool`` column with two
      blocks serialized OUT of reading order → engine must restore
      (y0, x0) order (app.py:273-360 semantics)

This is the per-row-invariant check (BASELINE.json input_hint) running
inside the driver's DuckDB gate, complementing the pytest golden gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .assemble import assemble_conversations_app
from .extract import extract_turns
from .registry import load, register, spread_scan

N_CONVS_MOD = 100


def derive_transcripts(docs: DataFrame) -> DataFrame:
    """documents → transcripts(conv_id, turn_idx, role, text, tool, ts),
    deterministic pure-column mapping (no UDF, no randomness)."""
    conv_id = F.concat(
        F.lit("conv-"), F.lpad((F.col("doc_id") % N_CONVS_MOD).cast("string"), 6, "0")
    )
    turn_idx = F.floor(F.col("doc_id") / N_CONVS_MOD).cast("int")
    variant = F.col("doc_id") % 4
    # HTML-escape the embedded text so the wrap is valid HTML for ANY
    # corpus content ('<', '&' in documents.text must not change the
    # markup structure); the stripper's unescape restores the original
    html_esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    text = (
        F.when(
            variant == 0,
            F.concat(
                F.lit('<html><body><nav><a href="/">home</a></nav><p>'),
                html_esc,
                F.lit("</p></body></html>"),
            ),
        )
        .when(variant == 1, F.concat(F.col("text"), F.lit("\n\n![fig](img-0.jpeg)")))
        .otherwise(F.col("text"))
    )
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (turn_idx % 3 + 1).cast("int"),
    )
    ts = F.timestamp_add(
        "MINUTE", F.col("doc_id").cast("int"), F.lit("2024-01-01 00:00:00").cast("timestamp")
    )
    # variant 3: span-source doc, two blocks serialized out of reading order
    words = F.split(F.col("text"), " ")
    head = F.array_join(F.slice(words, 1, 3), " ")
    tail = F.array_join(
        F.slice(words, 4, F.greatest(F.size(words) - 3, F.lit(0))), " "
    )
    # build the span-source doc as a STRUCT and serialize with to_json so
    # quotes/backslashes/control chars in documents.text are escaped
    # correctly (raw concat would break json.loads on such corpora)
    def _block(txt, y0):
        return F.struct(
            txt.alias("text"),
            F.array(F.lit(10.0), F.lit(y0), F.lit(300.0), F.lit(y0 + 12.0)).alias(
                "bbox"
            ),
            F.lit("text").alias("kind"),
        )

    tool_json = F.to_json(
        F.struct(
            F.array(
                F.struct(
                    F.lit(0).alias("index"),
                    F.array(_block(tail, 200.0), _block(head, 50.0)).alias("blocks"),
                )
            ).alias("pages")
        )
    )
    tool = F.when(variant == 3, tool_json).otherwise(F.lit(""))
    return docs.select(
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


_DERIVED_SQL = f"""
    SELECT 'conv-' || lpad(CAST(doc_id % {N_CONVS_MOD} AS VARCHAR), 6, '0') AS conv_id,
           CAST(doc_id // {N_CONVS_MOD} AS INT) AS turn_idx,
           doc_id % 4 AS variant, text
    FROM documents
"""

_PER_TURN_SQL = f"""
    WITH t AS ({_DERIVED_SQL}),
    split AS (
      SELECT *,
             list_aggr(string_split(text, ' ')[1:3], 'string_agg', ' ') AS head,
             CASE WHEN len(string_split(text, ' ')) > 3
                  THEN list_aggr(string_split(text, ' ')[4:], 'string_agg', ' ')
                  ELSE '' END AS tail
      FROM t)
    SELECT conv_id, turn_idx,
           CASE WHEN variant = 0 THEN 'html'
                WHEN variant = 3 THEN 'spans'
                ELSE 'markdown' END AS kind,
           CASE WHEN variant = 0 THEN
                  (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) >= 10
                        THEN list_aggr(regexp_split_to_array(trim(text), '\\s+'),
                                       'string_agg', ' ')
                        ELSE '' END)
                WHEN variant = 1 THEN
                  text || chr(10) || chr(10) || '![fig](/image/page_' ||
                  CAST(turn_idx AS VARCHAR) || '_extracted_img-0_jpeg.jpeg)'
                WHEN variant = 3 THEN
                  (CASE WHEN tail = '' THEN head
                        ELSE head || chr(10) || tail END)
                ELSE text END AS extracted_text
    FROM split
"""


@register(
    "q_flagship_per_turn",
    _PER_TURN_SQL,
    "FLAGSHIP: per-turn vectorized extraction (HTML strip + markdown link "
    "rewrite) over transcripts derived from documents; true SQL oracle",
)
def q_flagship_per_turn(spark, sf_dir):
    # NOT spread_scan: measured at sf1.0, the serial extraction map is
    # ~0.5s while the extra exchange + second stage cost ~0.4s — the
    # spread only breaks even here (unlike m1/m3/f1 where the map is
    # hundreds of core-seconds); re-evaluate if the driver sf grows
    transcripts = derive_transcripts(load(spark, sf_dir, "documents"))
    return extract_turns(transcripts).select(
        "conv_id", "turn_idx", "kind", "extracted_text"
    )


@register(
    "q_flagship_assembled",
    f"""
    WITH per_turn AS ({_PER_TURN_SQL})
    SELECT conv_id,
           CAST(count(*) AS INT) AS n_turns,
           string_agg('# Страница ' || CAST(turn_idx + 1 AS VARCHAR) ||
                      chr(10) || chr(10) || extracted_text,
                      chr(10) || chr(10) || '---' || chr(10) || chr(10)
                      ORDER BY turn_idx) AS combined_app
    FROM per_turn GROUP BY conv_id
    """,
    "FLAGSHIP: ordered per-conversation assembly (W1 app variant, "
    "app.py:816-822) — stable turn ordering under a SQL oracle",
)
def q_flagship_assembled(spark, sf_dir):
    transcripts = derive_transcripts(load(spark, sf_dir, "documents"))
    return assemble_conversations_app(extract_turns(transcripts)).select(
        "conv_id", "n_turns", "combined_app"
    )


@register(
    "q_extract_kind_census",
    f"""
    WITH t AS ({_DERIVED_SQL})
    SELECT CASE WHEN variant = 0 THEN 'html'
                WHEN variant = 3 THEN 'spans'
                ELSE 'markdown' END AS kind,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rewritten
    FROM t GROUP BY 1
    """,
    "extraction census: turns per payload kind + rewrite counts (A1/A8)",
)
def q_extract_kind_census(spark, sf_dir):
    transcripts = derive_transcripts(load(spark, sf_dir, "documents"))
    return (
        extract_turns(transcripts)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("n_rewritten").cast("bigint").alias("n_rewritten"),
        )
    )
