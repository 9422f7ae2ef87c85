"""Exact-substring (token-window) dedup — differential against a
pure-Python reference (token-tuple equality, no hashing) plus planted
hand cases. The catalog surface (c1's n_windows / n_dup_windows /
dup_positions columns) is covered by test_oracle_parity; this file pins
the operator semantics and the span-removal path."""

import pandas as pd
import pytest

from mistral_ocr_app_spark.operators.substring_dedup import (
    duplicate_window_stats,
    strip_duplicate_windows,
)

W = 4  # small width so hand-built corpora stay readable


def ref_semantics(texts: dict[int, str], width: int):
    """Reference: lowered whitespace tokens, window = token tuple,
    canonical = lexicographically first (doc_id, pos) occurrence."""
    toks = {d: t.lower().split(" ") for d, t in texts.items()}
    occ: dict[tuple, list] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - width + 1):
            occ.setdefault(tuple(tk[p : p + width]), []).append((d, p))
    dup = {d: [] for d in texts}
    for lst in occ.values():
        if len(lst) > 1:
            for d, p in sorted(lst)[1:]:
                dup[d].append(p)
    stats = {
        d: (
            max(0, len(toks[d]) - width + 1) if len(toks[d]) >= width else 0,
            len(dup[d]),
            sorted(dup[d]),
        )
        for d in texts
    }
    cleaned = {}
    for d, t in texts.items():
        orig = t.split(" ")
        removed = {i for p in dup[d] for i in range(p, p + width)}
        cleaned[d] = " ".join(
            tok for i, tok in enumerate(orig) if i not in removed
        )
    return stats, cleaned


def make_docs(spark, texts: dict[int, str]):
    return spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        )
    )


PLANTED = {
    0: "alpha beta gamma delta epsilon zeta unique0 tail0",
    # shares "alpha beta gamma delta epsilon zeta" with doc 0 → its
    # windows at pos 2..4 are non-canonical duplicates
    1: "pre1 pre2 alpha beta gamma delta epsilon zeta post1",
    # within-doc repeat: "r1 r2 r3 r4" twice; second occurrence loses
    2: "r1 r2 r3 r4 mid r1 r2 r3 r4",
    # too short for any window
    3: "a b c",
    # case-folded match with doc 0's head
    4: "ALPHA BETA GAMMA DELTA end4 x4 y4 z4",
}


def collect_stats(df):
    return {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], list(r["dup_positions"]))
        for r in df.collect()
    }


def test_planted_corpus_stats(spark):
    got = collect_stats(duplicate_window_stats(make_docs(spark, PLANTED), width=W))
    want, _ = ref_semantics(PLANTED, W)
    assert got == want
    # spot-check the interesting rows explicitly, not just via the ref
    assert got[0][1] == 0  # doc 0 is canonical for every shared window
    assert got[1] == (6, 3, [2, 3, 4])
    assert got[2] == (6, 1, [5])
    assert got[3] == (0, 0, [])
    assert got[4][2] == [0]  # case-folded duplicate of doc 0's head


def test_planted_corpus_strip(spark):
    out = {
        r["doc_id"]: r["cleaned_text"]
        for r in strip_duplicate_windows(
            make_docs(spark, PLANTED), width=W
        ).collect()
    }
    _, want = ref_semantics(PLANTED, W)
    assert out == want
    # canonical copy survives verbatim; the non-canonical one is cut
    assert out[0] == PLANTED[0]
    assert out[1] == "pre1 pre2 post1"
    assert out[2] == "r1 r2 r3 r4 mid"  # dup window @5 removes tokens 5..8
    # original casing is preserved in the kept tokens
    assert out[4] == "end4 x4 y4 z4"


def test_differential_on_fixture_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {
        r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()
    }
    want_stats, want_clean = ref_semantics(texts, 10)
    got = collect_stats(duplicate_window_stats(docs, width=10))
    assert got == want_stats
    assert sum(n for _, n, _ in got.values()) > 0  # corpus has real dups
    cleaned = {
        r["doc_id"]: r["cleaned_text"]
        for r in strip_duplicate_windows(docs, width=10).collect()
    }
    assert cleaned == want_clean


def test_strip_keeps_schema_and_rowcount(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = strip_duplicate_windows(docs, width=10)
    assert out.count() == docs.count()
    assert set(docs.columns) | {"cleaned_text"} == set(out.columns)


def test_window_occurrences_rejects_overlong_document(spark):
    """The packed canonical key (doc_id*MAX_POS + pos) cannot represent
    documents over MAX_POS tokens — the stage must fail loudly instead
    of silently colliding keys across documents (r6 advice)."""
    import pytest
    from pyspark.sql.utils import PythonException

    from mistral_ocr_app_spark.operators.substring_dedup import (
        MAX_POS,
        _window_occurrences,
    )

    ok = spark.createDataFrame(
        [(1, "a b c d e f g h i j k")], "doc_id long, text string"
    )
    assert _window_occurrences(ok, 10, "doc_id", "text").count() == 2

    # overlong text: MAX_POS+1 single-char tokens
    long_txt = "x " * MAX_POS + "x"
    bad = spark.createDataFrame([(2, long_txt)], "doc_id long, text string")
    with pytest.raises(PythonException, match="MAX_POS"):
        _window_occurrences(bad, 10, "doc_id", "text").count()
