"""Document chunking: hand cases, pure-Python differential on the
fixture documents, and reconstruction (de-overlapped chunk concat ==
original text). The oracled catalog twin is c2's n_chunks column."""

import math

import pytest

from mistral_ocr_app_spark.operators.chunking import chunk_documents

SF_DIR = "/root/testdata/sf0.001"


def ref_chunks(text: str, chunk: int, overlap: int):
    toks = text.split(" ")
    stride = chunk - overlap
    n_chunks = math.ceil(max(len(toks) - overlap, 1) / stride)
    return [
        (i, i * stride, " ".join(toks[i * stride : i * stride + chunk]))
        for i in range(n_chunks)
    ]


def test_hand_cases(spark):
    rows = [
        ("exact", " ".join(f"t{i}" for i in range(64))),   # 64 tok → 1 chunk
        ("one_over", " ".join(f"t{i}" for i in range(65))),  # → 2 chunks
        ("short", "a b c"),                                  # → 1 short chunk
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["n_chunk_tokens"])
        for r in chunk_documents(df, 64, 16, id_col="doc_id").collect()
    }
    assert got == {
        ("exact", 0): (0, 64),
        ("one_over", 0): (0, 64),
        ("one_over", 1): (48, 17),
        ("short", 0): (0, 3),
    }


def test_invalid_overlap_rejected(spark):
    df = spark.createDataFrame([("d", "x y z")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, 32, 32)


def test_differential_and_reconstruction(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    got = {}
    for r in chunk_documents(docs, 24, 8).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_text"])
        )
    for d, t in texts.items():
        want = ref_chunks(t, 24, 8)
        assert sorted(got[d]) == want, d
        # de-overlapped concatenation (skip the first `overlap` tokens of
        # every non-first chunk) reconstructs the document
        rebuilt = []
        for i, (_, _, text) in enumerate(sorted(got[d])):
            piece = text.split(" ")
            rebuilt.extend(piece if i == 0 else piece[8:])
        assert " ".join(rebuilt) == t, d
