"""Deterministic transcript-corpus generator (FIXTURES.md §1-2).

Synthesizes the BASELINE.json input table
``transcripts(conv_id, turn_idx, role, text, tool, ts)`` at arbitrary
scale with a fixed seed, plus the golden per-turn / per-conversation
outputs the pytest equality gate compares against.

Payload classes (FIXTURES.md §2) and the reference behavior each one
exercises:
  markdown_with_image_refs  app.py:64-140 link extraction/rewrite
  mock_document             app.py:455-466 page shape + :816-822 assembly
  html_boilerplate          north-rule stripper (golden recorded at gen time)
  span_source               app.py:273-360 layout parse (in `tool` column)
  base64_images             app.py:179-216 decode/sanity

Everything is derived from ``numpy.random.RandomState(seed)`` — no
wall-clock, no ``os.urandom`` (SURVEY §2.8 X13).
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np
import pandas as pd

from .golden import golden_assemble_conversation, golden_extract_turn

_WORDS = (
    "data spark engine turn page document text extract pipeline table "
    "cluster shuffle window order batch arrow vector column parse token "
    "image figure caption result metric golden fixture stable lineage "
    "partition schema append commit resume salt skew broadcast"
).split()

_EXTS_STRICT = ["jpeg", "jpg", "JPEG", "Jpg"]
_EXTS_LOOSE = ["png", "webp", "gif", "PNG"]

ROLES = ["user", "assistant", "tool"]


def _sentence(rng: np.random.RandomState, n_words: int) -> str:
    words = rng.choice(_WORDS, size=n_words)
    return " ".join(words.tolist()).capitalize() + "."


def _paragraph(rng: np.random.RandomState, n_sentences: int = 3) -> str:
    return " ".join(_sentence(rng, int(rng.randint(8, 18))) for _ in range(n_sentences))


# ------------------------------------------------------------ payloads ----


def _markdown_payload(rng: np.random.RandomState) -> str:
    """Markdown with 0..4 image refs; duplicates, mixed-case exts,
    strict (img-N.jpeg) and non-strict (figN.png) targets mixed."""
    parts = [f"## {_sentence(rng, 4)[:-1]}", _paragraph(rng, 2)]
    n_refs = int(rng.randint(0, 5))
    refs = []
    for k in range(n_refs):
        if rng.rand() < 0.6:
            ext = _EXTS_STRICT[int(rng.randint(len(_EXTS_STRICT)))]
            ref = f"img-{k}.{ext}"
        else:
            ext = _EXTS_LOOSE[int(rng.randint(len(_EXTS_LOOSE)))]
            ref = f"fig{k}.{ext}"
        alt = "" if rng.rand() < 0.3 else f"figure {k}"
        refs.append(f"![{alt}]({ref})")
    if refs and rng.rand() < 0.3:
        refs.append(refs[0])  # duplicate identical link → first-occurrence trap
    for r in refs:
        parts.append(r)
        if rng.rand() < 0.5:
            parts.append(_sentence(rng, int(rng.randint(6, 14))))
    return "\n\n".join(parts)


def _plain_payload(rng: np.random.RandomState) -> str:
    return _paragraph(rng, int(rng.randint(1, 4)))


def _html_payload(rng: np.random.RandomState) -> tuple[str, str]:
    """(html, golden_main_text). Article content surrounded by nav /
    sidebar / footer boilerplate; golden recorded at generation time."""
    title = f"Article {_sentence(rng, 3)[:-1]}"
    n_paras = int(rng.randint(2, 6))
    paras = []
    for _ in range(n_paras):
        words = [str(w) for w in rng.choice(_WORDS, size=int(rng.randint(15, 40)))]
        # inline link inside content (below link-density threshold)
        if rng.rand() < 0.4 and len(words) > 20:
            i = int(rng.randint(5, 10))
            words[i] = f'<a href="/ref">{words[i]}</a>'
        paras.append(" ".join(words) + ".")
    nav_items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.choice(_WORDS, size=5)
    )
    related = "".join(
        f'<a href="/p/{k}">{_sentence(rng, 2)[:-1]}</a> ' for k in range(4)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<!DOCTYPE html>\n<html><head><title>t</title>"
        "<style>p { color: black }</style>"
        "<script>var x = '<p>not content</p>';</script></head>\n"
        f"<body><header><nav><ul>{nav_items}</ul></nav></header>\n"
        "<!-- boilerplate comment -->\n"
        f"<aside>Subscribe to the newsletter now</aside>\n"
        f"<article><h1>{title}</h1>\n{body_paras}\n"
        f"<div>{related}</div>"  # high link density → boilerplate
        "<p>Short teaser.</p>"  # < 10 words, not heading → boilerplate
        "</article>\n"
        f"<footer><p>© 2024 corp — <a href='/tos'>terms</a></p></footer>"
        "<div><span>unclosed span</body></html>"
    )
    golden_paras = [
        p.replace('<a href="/ref">', "").replace("</a>", "") for p in paras
    ]
    golden = "\n\n".join([title] + golden_paras)
    return html, golden


def _doc_payload(rng: np.random.RandomState) -> str:
    """Serialized multi-page document: mock-mode shape (app.py:455-466) —
    Cyrillic per-page headers, bold/italic body, page 2 image with EMPTY
    base64 (fallback path, app.py:440)."""
    base = f"doc_{int(rng.randint(1_000_000)):06d}.pdf"
    valid_b64 = base64.b64encode(bytes(rng.randint(0, 256, size=96, dtype=np.uint8))).decode()
    pages = [
        {
            "index": 0,
            "markdown": (
                f"# Страница 1 Демо Документа ({base})\n\n"
                f"Это демонстрационный текст со **страницы 1**.\n\n{_paragraph(rng, 2)}"
            ),
            "images": [],
        },
        {
            "index": 1,
            "markdown": (
                f"# Страница 2 Демо Документа ({base})\n\n"
                f"Это демонстрационный текст со *страницы 2*.\n\n"
                f"![img-0.jpeg](img-0.jpeg)\n\n{_paragraph(rng, 1)}"
            ),
            "images": [
                {"id": "img-0.jpeg", "image_base64": ""},  # empty → fallback census
                {"id": "img-1.jpeg", "image_base64": f"data:image/jpeg;base64,{valid_b64}"},
            ],
        },
    ]
    if rng.rand() < 0.3:
        pages.append({"index": 2, "markdown": _paragraph(rng, 2), "images": []})
    return json.dumps({"pages": pages}, ensure_ascii=False)


def _base64_payload(rng: np.random.RandomState) -> str:
    kind = rng.rand()
    if kind < 0.4:  # valid data-URI
        raw = bytes(rng.randint(0, 256, size=int(rng.randint(60, 300)), dtype=np.uint8))
        mime = ["image/png", "image/jpeg", "image/webp"][int(rng.randint(3))]
        return f"data:{mime};base64,{base64.b64encode(raw).decode()}"
    if kind < 0.6:  # bare base64, valid, large
        raw = bytes(rng.randint(0, 256, size=int(rng.randint(60, 200)), dtype=np.uint8))
        return base64.b64encode(raw).decode()
    if kind < 0.8:  # decodes to < 50 bytes → rejected (app.py:204)
        raw = bytes(rng.randint(0, 256, size=int(rng.randint(8, 49)), dtype=np.uint8))
        return base64.b64encode(raw).decode()
    # corrupt payload behind a data-URI header → decode error path
    return "data:image/png;base64,%%%not-base64%%%"


def _span_payload(rng: np.random.RandomState) -> str:
    """Span-source document with blocks serialized OUT of reading order;
    includes image blocks and one CMYK image to exercise the filter."""
    n_pages = int(rng.randint(1, 4))
    pages = []
    for p in range(n_pages):
        blocks = []
        n_blocks = int(rng.randint(2, 7))
        for b in range(n_blocks):
            y0 = float(rng.randint(0, 700))
            x0 = float(rng.randint(0, 400))
            if rng.rand() < 0.25:
                cmyk = rng.rand() < 0.3
                blocks.append(
                    {
                        "text": "",
                        "bbox": [x0, y0, x0 + 120.0, y0 + 80.0],
                        "kind": "image",
                        "width": 240,
                        "height": 160,
                        "channels": 4 if cmyk else 3,
                        "alpha": 0,
                    }
                )
            else:
                blocks.append(
                    {
                        "text": _sentence(rng, int(rng.randint(5, 12))),
                        "bbox": [x0, y0, x0 + 300.0, y0 + 14.0],
                        "kind": "text",
                    }
                )
        order = rng.permutation(len(blocks))
        pages.append({"index": p, "blocks": [blocks[i] for i in order]})
    return json.dumps({"pages": pages}, ensure_ascii=False)


# ----------------------------------------------------------- generator ----

_CLASS_WEIGHTS = [
    ("markdown", 0.35),
    ("plain", 0.10),
    ("html", 0.25),
    ("doc", 0.15),
    ("b64", 0.15),
]


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    heavy_convs: int = 3,
    heavy_turns: int = 800,
    base_turns: tuple[int, int] = (3, 40),
):
    """Build (transcripts, golden_turns, golden_convs) pandas DataFrames.

    The first ``heavy_convs`` conversations are pathologically long
    (skew fixture, SURVEY §4.3); rows are emitted globally shuffled so
    stable (conv_id, turn_idx) ordering is actually exercised.
    """
    rng = np.random.RandomState(seed)
    names = [c for c, _ in _CLASS_WEIGHTS]
    probs = np.array([w for _, w in _CLASS_WEIGHTS])
    probs = probs / probs.sum()

    rows = []
    golden_rows = []
    conv_rows = []
    t0 = pd.Timestamp("2024-01-01T00:00:00")
    for ci in range(n_convs):
        conv_id = f"conv-{ci:06d}"
        if ci < heavy_convs:
            n_turns = heavy_turns + int(rng.randint(0, heavy_turns // 2 + 1))
        else:
            n_turns = int(rng.randint(base_turns[0], base_turns[1] + 1))
        conv_texts = []
        for ti in range(n_turns):
            role = ROLES[ti % 3]
            tool = ""
            html_golden = None
            if role == "tool" and rng.rand() < 0.7:
                tool = _span_payload(rng)
                text = ""
            else:
                cls = names[int(rng.choice(len(names), p=probs))]
                if cls == "markdown":
                    text = _markdown_payload(rng)
                elif cls == "plain":
                    text = _plain_payload(rng)
                elif cls == "html":
                    text, html_golden = _html_payload(rng)
                elif cls == "doc":
                    text = _doc_payload(rng)
                else:
                    text = _base64_payload(rng)
            ts = t0 + pd.Timedelta(hours=ci) + pd.Timedelta(minutes=ti)
            rows.append((conv_id, ti, role, text, tool, ts))
            g = golden_extract_turn(text, tool, ti, html_golden=html_golden)
            golden_rows.append(
                (
                    conv_id,
                    ti,
                    g["kind"],
                    g["extracted_text"],
                    g["n_refs"],
                    g["n_images"],
                    g["n_rewritten"],
                    g["n_spans"],
                    g["valid"],
                )
            )
            conv_texts.append((ti, g["extracted_text"]))
        asm = golden_assemble_conversation(conv_texts)
        conv_rows.append(
            (conv_id, len(conv_texts), asm["combined_app"], asm["combined_cli"])
        )

    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    # microsecond precision: Spark's parquet reader rejects TIMESTAMP(NANOS)
    transcripts["ts"] = transcripts["ts"].astype("datetime64[us]")
    # global shuffle: ordering must come from (conv_id, turn_idx), not file order
    perm = rng.permutation(len(transcripts))
    transcripts = transcripts.iloc[perm].reset_index(drop=True)

    golden_turns = pd.DataFrame(
        golden_rows,
        columns=[
            "conv_id",
            "turn_idx",
            "kind",
            "extracted_text",
            "n_refs",
            "n_images",
            "n_rewritten",
            "n_spans",
            "valid",
        ],
    )
    golden_turns["turn_idx"] = golden_turns["turn_idx"].astype("int32")
    golden_convs = pd.DataFrame(
        conv_rows, columns=["conv_id", "n_turns", "combined_app", "combined_cli"]
    )
    return transcripts, golden_turns, golden_convs


def write_fixture(out_dir: str, **kwargs) -> dict[str, str]:
    """Write transcripts + goldens as parquet; returns path map."""
    os.makedirs(out_dir, exist_ok=True)
    transcripts, golden_turns, golden_convs = generate_transcripts(**kwargs)
    paths = {
        "transcripts": os.path.join(out_dir, "transcripts.parquet"),
        "golden_turns": os.path.join(out_dir, "golden_turns.parquet"),
        "golden_convs": os.path.join(out_dir, "golden_convs.parquet"),
    }
    transcripts.to_parquet(paths["transcripts"], index=False)
    golden_turns.to_parquet(paths["golden_turns"], index=False)
    golden_convs.to_parquet(paths["golden_convs"], index=False)
    return paths
