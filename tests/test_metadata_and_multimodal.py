"""Code-metadata merge/enrich operators and multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from meds_polars_functions_spark.operators.extract_code_metadata import (
    enrich_code_metadata,
    merge_duplicate_codes,
)
from meds_polars_functions_spark.operators.multimodal import (
    extract_image_features,
    fake_decode_image,
    resize_stub,
    sample_frame_indices,
)


def test_merge_duplicate_codes(spark):
    rows = [
        ("HR", "heart rate", ["LOINC/1"]),
        ("HR", "pulse", ["LOINC/2", "LOINC/1"]),
        ("TEMP", "temperature", None),
    ]
    df = spark.createDataFrame(
        rows, "code string, description string, parent_codes array<string>"
    )
    out = {r["code"]: r for r in merge_duplicate_codes(df).collect()}
    assert out["HR"]["description"] == "heart rate;pulse"
    assert sorted(out["HR"]["parent_codes"]) == ["LOINC/1", "LOINC/2"]
    assert out["TEMP"]["parent_codes"] == []


def test_enrich_keeps_existing_on_conflict(spark):
    old = spark.createDataFrame(
        [("HR", "old-desc"), ("ONLY_OLD", "x")], "code string, description string"
    )
    new = spark.createDataFrame(
        [("HR", "new-desc", 1), ("ONLY_NEW", "y", 2)],
        "code string, description string, extra int",
    )
    out = {r["code"]: r for r in enrich_code_metadata(old, new).collect()}
    assert out["HR"]["description"] == "old-desc"  # existing wins
    assert out["ONLY_NEW"]["description"] == "y"
    assert out["ONLY_OLD"]["extra"] is None
    assert out["ONLY_NEW"]["extra"] == 2


def test_image_features_batch_shape(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(b"abcdef")), (2, bytearray(b"")), (3, None)],
        "doc_id long, image binary",
    )
    out = {r["doc_id"]: r["features"] for r in extract_image_features(docs).collect()}
    assert len(out[1]) == 8
    assert out[1] == pytest.approx(fake_decode_image(b"abcdef", 8), abs=1e-6)
    assert out[3] == [0.0] * 8  # null blob -> zero features, not a crash


def test_sample_frame_indices(spark):
    df = spark.createDataFrame([(1, 100), (2, 10), (3, 0)], "vid long, n_frames int")
    out = {r["vid"]: r["frame_indices"] for r in sample_frame_indices(df, "n_frames", every_n=30).collect()}
    assert out[1] == [0, 30, 60, 90]
    assert out[2] == [0]
    assert out[3] == [0]


def test_resize_stub_raises_at_execution_only(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, blob binary")
    plan = resize_stub(df, "blob", 64, 64)  # plan builds fine
    assert plan.schema == df.schema
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        plan.collect()
