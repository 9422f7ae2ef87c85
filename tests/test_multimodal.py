"""Multimodal binary-column plumbing: real header parsing, deterministic
stub decode, batch fan-out shapes."""

import struct

from pyspark.sql import functions as F

from mistral_ocr_app_spark.operators.multimodal import (
    extract_media_features,
    media_from_documents,
    parse_png_dims,
    resize_images,
    sample_video_frames,
    sniff_format,
)

SF_DIR = "/root/testdata/sf0.001"

PNG = bytes.fromhex("89504e470d0a1a0a0000000d49484452") + struct.pack(">II", 800, 600)


def test_magic_sniffing():
    assert sniff_format(PNG) == "png"
    assert sniff_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert sniff_format(b"RIFF....WEBP") == "webp"
    assert sniff_format(b"RIFF....WAVE") == "wav"
    assert sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert sniff_format(b"") == "empty"
    assert sniff_format(b"garbage") == "unknown"


def test_png_header_parse_is_real():
    assert parse_png_dims(PNG) == (800, 600)
    assert parse_png_dims(b"notpng") is None


def _media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return media_from_documents(docs)


def test_feature_extraction_schema_and_png_path(spark):
    feats = extract_media_features(_media(spark))
    pdf = feats.toPandas()
    assert len(pdf) == 500
    # every image row carries the real PNG header → real parse kicks in
    img = pdf[pdf["kind"] == "image"]
    assert (img["format"] == "png").all()
    assert (img["width"] == 320 + (img["media_id"] % 5) * 64).all()
    assert (img["height"] == 240 + (img["media_id"] % 7) * 32).all()
    # video rows carry the synthetic mp4 container → real sniff + real
    # frame-count header parse; audio rows are raw bytes → unknown
    vid = pdf[pdf["kind"] == "video"]
    assert (vid["format"] == "mp4").all()
    assert (vid["n_frames"] == 24 + (vid["media_id"] % 7) * 16).all()
    aud = pdf[pdf["kind"] == "audio"]
    assert (aud["format"] == "unknown").all()
    assert aud["width"].between(64, 1024).all()


def test_feature_extraction_deterministic(spark):
    a = extract_media_features(_media(spark)).toPandas().sort_values("media_id")
    b = (
        extract_media_features(_media(spark).repartition(7))
        .toPandas()
        .sort_values("media_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_resize_bounds(spark):
    thumbs = resize_images(_media(spark), max_side=128).toPandas()
    assert len(thumbs) > 0
    assert (thumbs[["thumb_w", "thumb_h"]].max(axis=1) <= 128).all()
    assert (thumbs[["thumb_w", "thumb_h"]] >= 1).all().all()


def test_frame_sampling_fanout(spark):
    media = _media(spark)
    frames = sample_video_frames(media, every_k=16)
    pdf = frames.toPandas()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() == n_videos
    assert len(pdf) > n_videos  # fan-out: multiple frames per video
    assert (pdf["frame_idx"] % 16 == 0).all()
    per = pdf.groupby("media_id")["frame_idx"].min()
    assert (per == 0).all()
