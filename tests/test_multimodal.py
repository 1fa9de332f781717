"""Multimodal plumbing: schemas, Arrow batch shapes, deterministic fake
features, frame-sampling fan-out, byte-budget repartitioning, stub guards."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from myscaledb_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    FEATURE_DIM,
    extract_features,
    fake_features,
    frame_sample_plan,
    media_repartition,
    resize_images,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", "image/png", 64, 64, None),
        (2, "image", b"\x89PNG-fake-bytes-22", "image/png", 32, 32, None),
        (3, "audio", b"RIFF-fake-wav", "audio/wav", None, None, 4000),
        (4, "video", b"\x00\x00ftyp-fake-mp4", "video/mp4", 640, 480, 3500),
        (5, "video", b"\x00\x00ftyp-fake-mp4-2", "video/mp4", 640, 480, 900),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_feature_extraction_deterministic(spark, media_df):
    out = extract_features(media_df).collect()
    assert len(out) == 5
    by_id = {r.media_id: r for r in out}
    raw = b"\x89PNG-fake-bytes-1"
    assert by_id[1].content_sha == hashlib.sha256(raw).hexdigest()
    assert by_id[1].n_bytes == len(raw)
    assert len(by_id[1].features) == FEATURE_DIM
    # same bytes → same features (python-side check)
    assert by_id[1].features == pytest.approx(fake_features(raw), abs=1e-6)


def test_feature_extraction_is_arrow_batched(spark, media_df):
    plan = extract_features(media_df)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_frame_sampling_fanout(spark, media_df):
    frames = frame_sample_plan(media_df, every_ms=1000).collect()
    # video 4: 3500ms → 3 frames; video 5: 900ms → 1 frame
    got = {(r.media_id, r.frame_idx, r.frame_ts_ms) for r in frames}
    assert got == {(4, 0, 0), (4, 1, 1000), (4, 2, 2000), (5, 0, 0)}


def test_media_repartition(spark, media_df):
    out = media_repartition(media_df, target_mb_per_task=64)
    assert out.rdd.getNumPartitions() >= 1
    assert out.count() == 5


def test_resize_unsupported_format_raises_cleanly(spark, media_df):
    with pytest.raises(Exception) as ei:
        resize_images(media_df.filter(F.col("kind") == "image"), 16, 16).collect()
    assert "Pillow" in str(ei.value) or "NotImplementedError" in str(ei.value)


def test_real_decoder_guard_unsupported_format(spark, media_df):
    with pytest.raises(Exception) as ei:
        extract_features(media_df, use_real_decoder=True).collect()
    assert "Pillow" in str(ei.value) or "NotImplementedError" in str(ei.value)


# --- real builtin codec: BMP/PPM ---------------------------------------------
def test_bmp_roundtrip_and_ppm():
    import numpy as np
    from myscaledb_spark.operators.imagecodec import (
        decode_image,
        encode_bmp,
        generate_bmp,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 9, 3), dtype=np.uint8)  # odd width → row padding
    assert np.array_equal(decode_image(encode_bmp(img)), img)

    small = resize_nearest(img, 4, 6)
    assert small.shape == (6, 4, 3)

    ppm = b"P6\n# comment\n3 2\n255\n" + bytes(range(18))
    arr = decode_image(ppm)
    assert arr.shape == (2, 3, 3) and arr[0, 0, 0] == 0 and arr[1, 2, 2] == 17

    bmp = generate_bmp(8, 5, seed=3)
    assert decode_image(bmp).shape == (5, 8, 3)
    assert bmp == generate_bmp(8, 5, seed=3)  # deterministic


@pytest.fixture(scope="module")
def bmp_df(spark):
    from myscaledb_spark.operators.imagecodec import generate_bmp

    rows = [
        (i, "image", generate_bmp(32 + i, 24 + i, seed=i), "image/bmp", 32 + i, 24 + i, None)
        for i in range(4)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_resize_images_real_bmp(spark, bmp_df):
    import numpy as np
    from myscaledb_spark.operators.imagecodec import (
        decode_image,
        generate_bmp,
        resize_nearest,
    )

    out = {r.media_id: r for r in resize_images(bmp_df, 16, 12).collect()}
    assert len(out) == 4
    for i, r in out.items():
        assert (r.width, r.height, r.mime) == (16, 12, "image/bmp")
        arr = decode_image(bytes(r.content))
        assert arr.shape == (12, 16, 3)
        want = resize_nearest(decode_image(generate_bmp(32 + i, 24 + i, seed=i)), 16, 12)
        assert np.array_equal(arr, want)


def test_extract_features_real_decoder_bmp(spark, bmp_df):
    out = extract_features(bmp_df, use_real_decoder=True).collect()
    assert len(out) == 4
    assert all(len(r.features) == FEATURE_DIM for r in out)


def test_get_objects_binaryfile(spark, tmp_path):
    """getObject()/ObjectToFetch: rows hold URL pointers; get_objects
    materializes bytes through the binaryFile source."""
    from myscaledb_spark.operators.multimodal import get_objects

    payloads = {}
    for i in range(3):
        p = tmp_path / f"obj_{i}.bin"
        data = bytes([i]) * (10 + i)
        p.write_bytes(data)
        payloads[str(p)] = data

    rows = [(i, path) for i, path in enumerate(sorted(payloads))]
    df = spark.createDataFrame(rows, "obj_id int, url string")
    out = get_objects(df, "url")
    got = {r.url: bytes(r.content) for r in out.collect()}
    assert got == payloads
    # missing object → null content, row preserved (left join semantics)
    df2 = spark.createDataFrame(
        [(99, str(tmp_path / "missing.bin"))], "obj_id int, url string"
    )
    # dir exists (tmp_path) so listing succeeds; the path just doesn't match
    r = get_objects(df2, "url").first()
    assert r.content is None


def test_get_objects_explicit_roots(spark, tmp_path):
    """roots= skips the directory aggregation entirely — the scale path when
    prefixes are known (the URL set itself never reaches the driver)."""
    from myscaledb_spark.operators.multimodal import get_objects

    p = tmp_path / "a.bin"
    p.write_bytes(b"hello")
    df = spark.createDataFrame([(1, str(p))], "obj_id int, url string")
    out = get_objects(df, "url", roots=[str(tmp_path)]).collect()
    assert bytes(out[0].content) == b"hello"


def test_get_objects_dir_cap(spark, tmp_path, monkeypatch):
    """More distinct prefixes than the cap → explicit error telling the
    caller to pass roots, instead of an unbounded driver collect."""
    from myscaledb_spark.operators import multimodal

    monkeypatch.setattr(multimodal, "_MAX_OBJECT_DIRS", 2)
    paths = []
    for i in range(3):
        d = tmp_path / f"d{i}"
        d.mkdir()
        f = d / "x.bin"
        f.write_bytes(b"x")
        paths.append(str(f))
    df = spark.createDataFrame([(i, p) for i, p in enumerate(paths)], "obj_id int, url string")
    import pytest

    with pytest.raises(ValueError, match="roots"):
        multimodal.get_objects(df, "url")


def test_fetch_objects_in_executors(spark, tmp_path):
    """Executor-side fetch: no listing, missing file → null content."""
    from myscaledb_spark.operators.multimodal import fetch_objects_in_executors

    p = tmp_path / "b.bin"
    p.write_bytes(b"world")
    df = spark.createDataFrame(
        [(1, str(p)), (2, str(tmp_path / "nope.bin"))], "obj_id int, url string"
    )
    got = {r.obj_id: r.content for r in fetch_objects_in_executors(df, "url").collect()}
    assert bytes(got[1]) == b"world" and got[2] is None
