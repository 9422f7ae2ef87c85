#!/usr/bin/env python
"""S13 export job — assembled conversations → ZIP / markdown / HTML.

The reference's export options (README.md:49-53, app.py:809-846
``save_results_to_files``): a combined ``.md`` (``# Страница {i+1}``
headers joined by ``\\n\\n---\\n\\n``), a ``metadata.json`` that keeps
image entries as ``{id, path}`` pairs only (no payloads), an
``images/figure_X.png`` folder in the ZIP variant, and an interactive
HTML page. Presentation/export is a driver-side boundary by design
(SURVEY §2.1 S12/S13): the distributed part — extraction + ordered
assembly — runs on Spark; the driver then STREAMS conversations via
``toLocalIterator`` (never ``collect``) and writes the archive with
stdlib ``zipfile``.

Reference deltas, deliberate:
  * filenames derive from conv_id, not ``os.urandom`` (X13: the
    urandom ban — exports must be deterministic and resumable);
  * one export bundle per conversation instead of per upload request.

Usage:
    spark-submit jobs/export_job.py --input transcripts_parquet \\
        --output /path/out --format zip|md|html [--limit N]
"""

from __future__ import annotations

import argparse
import html as html_mod
import json
import os
import re
import sys
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the /image/ paths the extractor rewrites refs to (markdown.py X3/X5)
_IMG_REF = re.compile(r"!\[[^\]]*\]\((/image/[^)\s]+)\)")

HTML_TEMPLATE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>body{{font-family:sans-serif;max-width:60em;margin:2em auto}}
details{{border:1px solid #ccc;margin:.5em 0;padding:.5em}}</style>
</head><body><h1>{title}</h1><p>{n_turns} turns</p>
{sections}
</body></html>
"""


def conversation_markdown(row) -> str:
    """The app-variant combined markdown (assemble_conversations output
    is already the reference's page-joined shape)."""
    return row["combined_app"]


def conversation_metadata(row) -> dict:
    """metadata.json analog (app.py:832-841): counts + image refs as
    {id, path} pairs, never payloads."""
    refs = _IMG_REF.findall(row["combined_app"])
    return {
        "conv_id": row["conv_id"],
        "n_turns": row["n_turns"],
        "images": [
            {"id": f"figure_{i}", "path": p} for i, p in enumerate(refs)
        ],
    }


def conversation_html(row) -> str:
    """Interactive-HTML analog: one <details> section per page split on
    the page joiner, escaped (no script injection from corpus text)."""
    pages = row["combined_app"].split("\n\n---\n\n")
    sections = "\n".join(
        "<details{}><summary>{}</summary><pre>{}</pre></details>".format(
            " open" if i == 0 else "",
            html_mod.escape(p.splitlines()[0] if p else f"page {i + 1}"),
            html_mod.escape(p),
        )
        for i, p in enumerate(pages)
    )
    return HTML_TEMPLATE.format(
        title=html_mod.escape(row["conv_id"]),
        n_turns=row["n_turns"],
        sections=sections,
    )


def export(spark, input_path: str, output_dir: str, fmt: str = "zip",
           limit: int | None = None) -> dict:
    """transcripts parquet → export bundle(s). Returns stats."""
    from mistral_ocr_app_spark.functions.markdown import secure_filename
    from mistral_ocr_app_spark.operators.assemble import assemble_conversations
    from mistral_ocr_app_spark.operators.extract import extract_turns

    os.makedirs(output_dir, exist_ok=True)
    assembled = assemble_conversations(
        extract_turns(spark.read.parquet(input_path))
    ).orderBy("conv_id")
    if limit:
        assembled = assembled.limit(limit)

    n_convs = n_files = 0
    zf = None
    if fmt == "zip":
        zf = zipfile.ZipFile(
            os.path.join(output_dir, "export.zip"), "w", zipfile.ZIP_DEFLATED
        )
    try:
        # stream, never collect: one conversation in driver memory at a time
        for row in assembled.toLocalIterator():
            name = secure_filename(f"{row['conv_id']}")
            md = conversation_markdown(row)
            meta = conversation_metadata(row)
            if fmt == "zip":
                zf.writestr(f"{name}/document.md", md)
                zf.writestr(
                    f"{name}/metadata.json",
                    json.dumps(meta, indent=2, ensure_ascii=False),
                )
                for img in meta["images"]:
                    # images/figure_X.png entries (README.md:51): paths
                    # only — payload export needs the media store, which
                    # is a separate binary column pipeline (multimodal.py)
                    zf.writestr(
                        f"{name}/images/{img['id']}.png.path",
                        img["path"],
                    )
                n_files += 2 + len(meta["images"])
            elif fmt == "md":
                with open(os.path.join(output_dir, f"{name}.md"), "w") as f:
                    f.write(md)
                n_files += 1
            elif fmt == "html":
                with open(os.path.join(output_dir, f"{name}.html"), "w") as f:
                    f.write(conversation_html(row))
                n_files += 1
            else:
                raise ValueError(f"unknown format {fmt!r}")
            n_convs += 1
    finally:
        if zf is not None:
            zf.close()
    return {"n_convs": n_convs, "n_files": n_files, "format": fmt,
            "output": output_dir}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--output", required=True, help="export directory")
    ap.add_argument("--format", choices=["zip", "md", "html"], default="zip")
    ap.add_argument("--limit", type=int, default=None,
                    help="export only the first N conversations (by conv_id)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("conversation_export").getOrCreate()
    stats = export(spark, args.input, args.output, fmt=args.format,
                   limit=args.limit)
    print(json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
