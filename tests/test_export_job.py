"""S13 export job: assembled conversations → ZIP/md/HTML bundles
(reference app.py:809-846 save_results_to_files + README export
options), driver-side streaming — never collect()."""

import json
import sys
import zipfile

sys.path.insert(0, "/root/repo/jobs")

from export_job import export  # noqa: E402

from mistral_ocr_app_spark.fixtures import write_fixture  # noqa: E402


def _fixture(spark, tmp_path, n=5):
    return write_fixture(str(tmp_path / "fx"), n_convs=n, seed=3)


def test_export_zip_structure_and_content(spark, tmp_path):
    paths = _fixture(spark, tmp_path)
    out = tmp_path / "out"
    stats = export(spark, paths["transcripts"], str(out), fmt="zip")
    assert stats["n_convs"] == 5

    with zipfile.ZipFile(out / "export.zip") as z:
        names = z.namelist()
        docs = sorted(n for n in names if n.endswith("document.md"))
        metas = sorted(n for n in names if n.endswith("metadata.json"))
        assert len(docs) == len(metas) == 5
        md = z.read(docs[0]).decode("utf-8")
        # the reference's combined shape: page headers + --- joiners
        assert md.startswith("# Страница ")
        assert "\n\n---\n\n" in md
        meta = json.loads(z.read(metas[0]))
        assert set(meta) == {"conv_id", "n_turns", "images"}
        assert meta["n_turns"] >= 1
        # image entries are {id, path} pairs only — no payloads
        for img in meta["images"]:
            assert set(img) == {"id", "path"}
            assert img["path"].startswith("/image/")

    # exported markdown is exactly the engine's assembled output
    from mistral_ocr_app_spark.operators.assemble import assemble_conversations
    from mistral_ocr_app_spark.operators.extract import extract_turns

    t = spark.read.parquet(paths["transcripts"])
    row = assemble_conversations(extract_turns(t)).orderBy("conv_id").first()
    with zipfile.ZipFile(out / "export.zip") as z:
        assert z.read(docs[0]).decode("utf-8") == row["combined_app"]


def test_export_md_and_html(spark, tmp_path):
    paths = _fixture(spark, tmp_path, n=3)
    out_md, out_html = tmp_path / "md", tmp_path / "html"
    s1 = export(spark, paths["transcripts"], str(out_md), fmt="md", limit=2)
    assert s1["n_convs"] == 2 and len(list(out_md.glob("*.md"))) == 2

    s2 = export(spark, paths["transcripts"], str(out_html), fmt="html", limit=2)
    assert s2["n_convs"] == 2
    page = next(iter(sorted(out_html.glob("*.html")))).read_text()
    assert "<details" in page and "Страница" in page
    # corpus text is escaped — no raw tags leak into the page
    assert "<script" not in page.lower()
