"""Multimodal plumbing tests: binary payload round-trip through Arrow,
mapInPandas fan-out shape, deterministic stub decode, schema contracts."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from zipkin_dependencies_spark.llm.multimodal import media_from_documents

    rows = [
        (0, "a" * 250),
        (1, "b" * 99),   # shorter than one frame
        (2, "hello world " * 30),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return media_from_documents(docs, frame_bytes=100)


def test_media_schema_and_payload_roundtrip(media):
    from zipkin_dependencies_spark.llm.multimodal import MEDIA_SCHEMA

    # same names/types (nullability differs between derivation and contract)
    assert media.schema.simpleString() == MEDIA_SCHEMA.simpleString()
    rows = {r["media_id"]: r for r in media.collect()}
    assert bytes(rows[0]["payload"]) == b"a" * 250  # binary survives Arrow
    assert rows[0]["kind"] == "image"
    assert rows[1]["kind"] == "audio"
    assert rows[2]["kind"] == "video"
    assert rows[0]["meta"]["n_frames"] == 2
    assert rows[1]["meta"]["n_frames"] == 0


def test_sample_frames_fanout(media):
    from zipkin_dependencies_spark.llm.multimodal import sample_frames

    frames = sample_frames(media, frame_bytes=100).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media.get(0, [])) == 2  # 250 bytes → 2 full frames
    assert 1 not in by_media  # sub-frame payload yields nothing
    assert len(by_media[2]) == 3  # 360 bytes → 3 frames
    f0 = sorted(by_media[0], key=lambda r: r["frame_idx"])[0]
    assert f0["frame_digest"] == hashlib.md5(b"a" * 100).hexdigest()
    assert f0["n_bytes"] == 100


def test_extract_features_deterministic(media):
    from zipkin_dependencies_spark.llm.multimodal import extract_features

    out = {r["media_id"]: r["embedding"] for r in extract_features(media, dim=8).collect()}
    assert all(len(v) == 8 for v in out.values())
    assert all(0.0 <= x <= 1.0 for v in out.values() for x in v)
    expected0 = int(hashlib.md5(("0:" + "a" * 250).encode()).hexdigest()[:2], 16) / 255.0
    assert out[0][0] == pytest.approx(expected0, abs=1e-7)
    # re-run identical (stable stub)
    again = {r["media_id"]: r["embedding"] for r in extract_features(media, dim=8).collect()}
    assert out == again


def test_media_stats(media):
    from zipkin_dependencies_spark.llm.multimodal import media_stats

    rows = {r["media_id"]: r for r in media_stats(media).collect()}
    assert rows[0]["n_bytes"] == 250
    assert rows[0]["digest"] == hashlib.md5(b"a" * 250).hexdigest()
    assert rows[0]["width"] == 250 % 640 and rows[0]["height"] == 250 % 480


def test_documents_fixture_is_ascii(spark):
    """The media_frames oracle slices TEXT by character while the Spark stub
    slices by byte — valid only while the fixture is pure ASCII. Guard it."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_non_ascii = docs.filter(
        F.octet_length("text") != F.length("text")
    ).count()
    assert n_non_ascii == 0
