"""Multimodal plumbing tests: schemas, mapInPandas signatures, batch
shapes, and the deterministic stub decode path (the codec libraries
are absent in this container by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filesystemagent_spark.operators import dedup as D
from filesystemagent_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("/m/cat.jpg", b"\x89JPGpayload-cat" * 100),
        ("/m/cat_copy.jpg", b"\x89JPGpayload-cat" * 100),   # exact dup bytes
        ("/m/dog.png", b"\x89PNGpayload-dog" * 50),
        ("/m/clip.mp4", b"\x00\x00ftypmp4-payload" * 9000),  # ~2 frames worth
        ("/m/song.mp3", b"ID3audio-payload"),
        ("/m/readme.txt", b"not media"),
    ]
    return spark.createDataFrame(rows, "path string, content binary")


def test_media_type(media):
    got = {r["path"]: r["mt"] for r in media.select("path", M.media_type(F.col("path")).alias("mt")).collect()}
    assert got == {
        "/m/cat.jpg": "image",
        "/m/cat_copy.jpg": "image",
        "/m/dog.png": "image",
        "/m/clip.mp4": "video",
        "/m/song.mp3": "audio",
        "/m/readme.txt": None,
    }


def test_image_features_stub_deterministic(media):
    imgs = media.filter(M.media_type(F.col("path")) == "image")
    feats = M.image_features(imgs)
    rows = {r["path"]: r.asDict() for r in feats.collect()}
    assert set(rows) == {"/m/cat.jpg", "/m/cat_copy.jpg", "/m/dog.png"}
    assert all(r["decoder"] == "stub" for r in rows.values())
    # identical bytes → identical perceptual hashes; distinct bytes differ
    assert rows["/m/cat.jpg"]["phash64"] == rows["/m/cat_copy.jpg"]["phash64"]
    assert rows["/m/cat.jpg"]["phash64"] != rows["/m/dog.png"]["phash64"]
    assert rows["/m/cat.jpg"]["width"] > 0
    # deterministic across runs
    again = {r["path"]: r["phash64"] for r in M.image_features(imgs).collect()}
    assert again == {p: r["phash64"] for p, r in rows.items()}


def test_resize_images_shape(media):
    imgs = media.filter(M.media_type(F.col("path")) == "image")
    out = M.resize_images(imgs, 32, 32)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["width"] == 32 and r["height"] == 32 for r in rows)
    assert all(isinstance(bytes(r["content"]), bytes) and len(r["content"]) > 0 for r in rows)


def test_sample_frames_explodes(media):
    vids = media.filter(M.media_type(F.col("path")) == "video")
    frames = M.sample_frames(vids, every_s=0.5)
    rows = frames.collect()
    assert len(rows) >= 2  # 1→N explode shape
    assert [r["frame_index"] for r in rows] == list(range(len(rows)))
    assert rows[1]["timestamp_s"] == 0.5
    assert rows[0]["frame"] != rows[1]["frame"]


def test_audio_features_gated(media):
    try:
        import soundfile  # noqa: F401

        pytest.skip("codec present; gate not exercised")
    except ImportError:
        pass
    auds = media.filter(M.media_type(F.col("path")) == "audio")
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        M.audio_features(auds).collect()


def test_hamming_helpers(spark):
    df = spark.createDataFrame([(0b1011, 0b0011), (5, 5)], "a long, b long")
    got = df.select(
        M.hamming_distance64(F.col("a"), F.col("b")).alias("d"),
        M.hamming_similarity64(F.col("a"), F.col("b")).alias("s"),
    ).collect()
    assert got[0]["d"] == 1 and got[1]["d"] == 0
    assert got[1]["s"] == 1.0
    assert abs(got[0]["s"] - (1 - 1 / 64)) < 1e-12


def test_hamming_near_dup_pairs(spark):
    rows = [
        (1, 0x0123456789ABCDEF),
        (2, 0x0123456789ABCDEE),  # distance 1 from id 1
        (3, 0x0123456789ABCDE0),  # distance 4 from id 1 — beyond threshold
        (4, -42),
        (5, -42),                 # distance 0 from id 4 (negative longs fine)
        (6, 0x7FFFFFFFFFFFFFFF),
    ]
    df = spark.createDataFrame(rows, "id long, h long")
    pairs = {(r["id_a"], r["id_b"]): r["distance"]
             for r in D.hamming_near_dup_pairs(df, "id", "h").collect()}
    assert pairs == {(1, 2): 1, (4, 5): 0}


def test_near_dup_clusters(spark):
    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "id long")
    # components: {1,2,3} via chain, {5,6}, singletons 4,7
    pairs = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (5, 6, 0)], "id_a long, id_b long, distance int"
    )
    labels = {r["id"]: r["cluster_id"]
              for r in D.near_dup_clusters(ids, pairs, "id").collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 7}
