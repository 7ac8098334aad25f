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


def test_resize_images_with_injected_fn(spark):
    from meds_polars_functions_spark.operators.multimodal import (
        nearest_neighbor_resample,
        resize_images,
    )

    # 4x2 single-channel "image": two rows of ramp bytes
    img = bytes([0, 10, 20, 30, 100, 110, 120, 130])
    df = spark.createDataFrame(
        [(1, bytearray(img), (4, 2, "raw"))],
        "doc_id long, image binary, meta struct<width:int,height:int,format:string>",
    )
    out = resize_images(
        df, "image", 2, 2, resize_fn=nearest_neighbor_resample
    ).collect()[0]
    # nearest-neighbor: columns 0,2 of each source row survive
    assert bytes(out["image"]) == bytes([0, 20, 100, 120])
    # metadata rewritten to the new dimensions, format preserved
    assert (out["meta"]["width"], out["meta"]["height"]) == (2, 2)
    assert out["meta"]["format"] == "raw"
    assert out["doc_id"] == 1


def test_resize_images_without_fn_raises_at_execution(spark):
    from meds_polars_functions_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, bytearray(b"xy"), (2, 1, "raw"))],
        "doc_id long, image binary, meta struct<width:int,height:int,format:string>",
    )
    plan = resize_images(df, "image", 8, 8)  # schema resolves without codecs
    assert [f.name for f in plan.schema.fields] == ["doc_id", "image", "meta"]
    with pytest.raises(Exception, match="NotImplementedError|resize_fn"):
        plan.collect()
