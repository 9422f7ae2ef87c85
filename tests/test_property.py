"""Property-based differential tests (hypothesis): engine == golden on
ARBITRARY inputs, not just generator-shaped ones."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from mistral_ocr_app_spark.fixtures import golden as g
from mistral_ocr_app_spark.functions import markdown as md
from mistral_ocr_app_spark.functions.classify import classify_payload
from mistral_ocr_app_spark.functions.html_strip import strip_boilerplate
from mistral_ocr_app_spark.functions.spans import parse_span_source

# text that may contain markdown-ish image refs in arbitrary positions
ref_st = st.builds(
    lambda alt, name, ext: f"![{alt}]({name}.{ext})",
    st.text(alphabet="ab c-", max_size=8).filter(lambda s: "]" not in s),
    st.sampled_from(["img-0", "img-12", "fig", "a/b", "x.y"]),
    st.sampled_from(["jpeg", "JPG", "png", "webp", "gif", "txt"]),
)
chunk_st = st.one_of(st.text(max_size=30), ref_st)
markdown_st = st.lists(chunk_st, max_size=8).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(markdown_st, st.integers(min_value=0, max_value=20))
def test_rewrite_engine_equals_golden(text, page_idx):
    assert md.rewrite_markdown_links(text, page_idx) == g.golden_update_markdown_links(
        text, page_idx
    )


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_arbitrary_text_never_crashes(text):
    kind = classify_payload(text)
    assert isinstance(kind, str)
    md.rewrite_markdown_links(text, 0)
    strip_boilerplate(text)
    parse_span_source(text)
    md.parse_base64_payload(text)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="<>/aip b!-&;=\"'", max_size=200))
def test_malformed_html_never_crashes(html):
    out = strip_boilerplate(html)
    assert isinstance(out, str)


span_block_st = st.fixed_dictionaries(
    {
        "text": st.text(max_size=10),
        "bbox": st.lists(
            st.floats(min_value=0, max_value=1000, allow_nan=False), min_size=4, max_size=4
        ),
        "kind": st.sampled_from(["text", "image"]),
        "channels": st.integers(min_value=1, max_value=5),
        "alpha": st.integers(min_value=0, max_value=1),
    }
)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {"index": st.integers(0, 5), "blocks": st.lists(span_block_st, max_size=6)}
        ),
        max_size=4,
    )
)
def test_span_parse_engine_equals_golden(pages):
    payload = json.dumps({"pages": pages})
    assert parse_span_source(payload) == g.golden_spans(payload)


# --- PNG codec roundtrip property (round 4: multi-channel) ------------

png_image_st = st.integers(1, 12).flatmap(
    lambda w: st.integers(1, 12).flatmap(
        lambda h: st.sampled_from([1, 2, 3, 4]).flatmap(
            lambda ch: st.tuples(
                st.just(w), st.just(h), st.just(ch),
                st.binary(min_size=w * h * ch, max_size=w * h * ch),
                st.lists(st.integers(0, 4), min_size=h, max_size=h),
            )
        )
    )
)


@settings(max_examples=200, deadline=None)
@given(png_image_st)
def test_png_roundtrip_any_channels_any_filters(img):
    """encode→decode is the identity for every (geometry, channel
    count, per-row filter choice) — the filters are byte-wise with a
    bpp offset, so this property catches any off-by-bpp error."""
    from mistral_ocr_app_spark.functions.png import decode_png, encode_png

    w, h, ch, pixels, filters = img
    data = encode_png(w, h, pixels, lambda y: filters[y], channels=ch)
    assert decode_png(data) == (w, h, ch, pixels)


@settings(max_examples=120, deadline=None)
@given(
    pos=st.integers(0, 10_000),
    val=st.integers(0, 255),
    seed=st.integers(0, 4),
)
def test_png_single_byte_mutation_never_crashes(pos, val, seed):
    """Untrusted-corpus hardening (symmetric with the JPEG fuzz): any
    single-byte corruption of a valid PNG must either decode or raise
    PngError — CRC catches most, but IDAT-length/filter-type/geometry
    corruptions each exercise a different guard; none may escape as
    struct.error/IndexError/zlib.error or hang."""
    import numpy as np

    from mistral_ocr_app_spark.functions.png import PngError, decode_png, encode_png

    rng = np.random.RandomState(seed)
    w, h, ch = 9, 7, (seed % 4) + 1
    pixels = bytes(rng.randint(0, 256, size=w * h * ch, dtype=np.uint8))
    data = bytearray(encode_png(w, h, pixels, channels=ch))
    data[pos % len(data)] = val
    try:
        W, H, C, px = decode_png(bytes(data))
        assert len(px) == W * H * C
    except PngError:
        pass  # the documented containment path


@settings(max_examples=200, deadline=None)
@given(png_image_st, st.integers(1, 10))
def test_resize_nearest_samples_exact_pixels(img, max_side):
    """Every thumbnail pixel is an exact source sample (all channels of
    the sampled pixel copied together, none invented)."""
    from mistral_ocr_app_spark.functions.png import resize_nearest

    w, h, ch, pixels, _ = img
    tw, th, tpx = resize_nearest(w, h, pixels, max_side, channels=ch)
    assert len(tpx) == tw * th * ch
    for j in range(th):
        for i in range(tw):
            src = ((j * h) // th * w + (i * w) // tw) * ch
            assert tpx[(j * tw + i) * ch : (j * tw + i + 1) * ch] == pixels[src : src + ch]
