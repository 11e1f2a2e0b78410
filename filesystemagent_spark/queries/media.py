"""Driver-gate queries for the multimodal / transform / Hamming-dedup
surface, run over the driver's `documents` table (text re-cast as a
binary payload where a media byte column is needed — the testdata has
no real media, the PLUMBING is what's under check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filesystemagent_spark.catalog import Catalog
from filesystemagent_spark.queries import register


def _hash60(col):
    """60-bit deterministic hash both engines can compute: first 15 hex
    chars of md5, parsed base-16. Collision odds at corpus scale are
    ~n²/2⁶¹ — for real perceptual hashes use image_features' phash64."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


@register(
    "doc_hamming_dup_pairs",
    tags=("dedup", "hamming", "band-join"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 40)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_hamming_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded Hamming self-join (F4 scale path) driven through its
    distance-0 slice, which DuckDB can oracle as an equality self-join:
    identical 40-char prefixes ⇒ identical 60-bit hashes ⇒ distance 0.
    Near-miss (1-2 bit) collisions between distinct md5 values are
    ~1e-15/pair — absent at gate scale, so both engines return exactly
    the duplicate-prefix pairs. Distance>0 recall is covered by unit
    tests with constructed hashes."""
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", _hash60(F.substring("text", 1, 40)).alias("h60")
    )
    pairs = hamming_near_dup_pairs(docs, "doc_id", "h60", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_png_roundtrip_dedup",
    tags=("multimodal", "png", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 50)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_png_roundtrip_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end-to-end and oracle-checked: each doc's
    50-char-prefix md5 expands to a deterministic 8x8 RGB image,
    encoded to REAL PNG bytes (functions/png.encode_png), decoded and
    perceptually hashed by the production `image_features` ladder
    (pure-PNG decoder -> luminance -> dhash), then deduped by the
    banded Hamming join. Identical prefixes give identical PNGs give
    dhash distance 0, so DuckDB oracles the pair set as an md5
    equality self-join — a cross-engine check that the whole
    decode-hash-dedup pipeline preserves duplicate structure.
    Near-miss collisions between distinct random dhashes are
    ~2e3/2^64 per pair — absent at any realistic scale.

    Scale shape: codec work is mapInPandas (Arrow batches, one Python
    round-trip); the join is the banded Hamming equi-join, never
    pairwise."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import png as P
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import image_features

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 50)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                # 192 deterministic bytes = 8x8 RGB from the prefix md5
                raw = b"".join(
                    _hl.sha256(hp.encode() + bytes([i])).digest() for i in range(6)
                )
                rgb = _np.frombuffer(raw, dtype=_np.uint8, count=192).reshape(8, 8, 3)
                rows.append(
                    {"path": str(doc_id), "content": P.encode_png(rgb)}
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    imgs = docs.mapInPandas(gen, "path string, content binary")
    feats = image_features(imgs).select(
        F.col("path").cast("long").alias("doc_id"), "dhash64", "decoder"
    )
    pairs = hamming_near_dup_pairs(feats, "doc_id", "dhash64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_png_whash_dedup",
    tags=("multimodal", "png", "whash", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 45)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_png_whash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wavelet-hash member of the perceptual-hash family
    (imagehash.whash semantics; reference media_fingerprinting.py:146
    — the last F2 gap), exercised end-to-end like
    doc_png_roundtrip_dedup: 45-char-prefix md5 -> deterministic 8x8
    RGB -> REAL PNG encode -> production image_features ladder
    (pure-PNG decode -> luminance -> Haar whash64) -> banded Hamming
    dedup. Identical prefixes give whash distance 0, so DuckDB oracles
    the pair set as an md5 equality self-join."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import png as P
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import image_features

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 45)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = b"".join(
                    _hl.sha256(hp.encode() + bytes([i])).digest() for i in range(6)
                )
                rgb = _np.frombuffer(raw, dtype=_np.uint8, count=192).reshape(8, 8, 3)
                rows.append({"path": str(doc_id), "content": P.encode_png(rgb)})
            yield _pd.DataFrame(rows, columns=["path", "content"])

    imgs = docs.mapInPandas(gen, "path string, content binary")
    feats = image_features(imgs).select(
        F.col("path").cast("long").alias("doc_id"), "whash64", "decoder"
    )
    pairs = hamming_near_dup_pairs(feats, "doc_id", "whash64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_gif_video_dedup",
    tags=("multimodal", "video", "gif", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 60)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_gif_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode, end-to-end and oracle-checked (SURVEY F3 —
    reference media_fingerprinting.py:166-179 fingerprints videos by
    sampling frames and collapsing their hashes): each doc's
    60-char-prefix md5 expands to a deterministic 3-frame 8x8 animated
    GIF (<=64 quantized colors so the encoder's single global palette
    holds), which the production pipeline then processes with NO
    knowledge of how it was built:

      sample_frames   — pure-stdlib animated-GIF decode (LZW,
                        compositing, per-frame delays), frames sampled
                        on the animation timeline, re-encoded as PNG;
      image_features  — the image ladder perceptually hashes each
                        sampled frame (pure PNG decode -> dhash64);
      video_hash64    — per-video BIT-MAJORITY hash, 64 JVM-side
                        conditional sums, one shuffle on path;
      hamming dedup   — the banded Hamming equi-join, never pairwise.

    Identical prefixes give byte-identical GIFs, identical sampled
    frames, identical majority hashes — distance-0 pairs that DuckDB
    oracles as an md5 equality self-join. Distinct docs produce
    near-random 64-bit hashes: a <=2-bit collision between any pair is
    ~2e3/2^64 — absent at any realistic scale.

    Scale shape: decode+hash is linear mapInPandas work; the only
    shuffles are the 1-per-video majority agg and the band join."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import gif as G
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import (
        image_features,
        sample_frames,
        video_hash64,
    )

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 60)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                frames = []
                for f in range(3):
                    raw = b"".join(
                        _hl.sha256(hp.encode() + bytes([f, i])).digest()
                        for i in range(6)
                    )
                    px = _np.frombuffer(raw, dtype=_np.uint8, count=192)
                    # quantize to 4 levels/channel: <=64 colors per GIF
                    frames.append(((px >> 6) * 85).reshape(8, 8, 3))
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": G.encode_gif_frames(frames, delay_s=1.0),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    vids = docs.mapInPandas(gen, "path string, content binary")
    frames = sample_frames(vids, every_s=1.0, max_frames=8)
    feats = image_features(frames.select("path", F.col("frame").alias("content")))
    vh = video_hash64(feats.select("path", "dhash64"))
    keyed = vh.select(
        F.col("path").cast("long").alias("doc_id"), "video_hash64"
    )
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "video_hash64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_mkv_video_dedup",
    tags=("multimodal", "video", "mkv", "mp4", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 58)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_mkv_video_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINER-INVARIANT video dedup through the round-8 MKV slice
    (SURVEY F3): each doc's 58-char-prefix md5 expands to 3
    deterministic 16x16 JPEG frames, muxed into Matroska
    (functions/mkv.py, CodecID V_MJPEG) for even doc_ids and ISO-BMFF
    MP4 (functions/mp4.py) for odd ones — then the production ladder
    runs with NO knowledge of how the bytes were built: sample_frames
    demuxes BOTH containers ('mkv-mjpeg-pure' / 'mp4-mjpeg-pure'),
    image_features JPEG-decodes and dhashes each frame, video_hash64
    takes the bit majority, and the banded Hamming join pairs them.
    JPEG is byte-deterministic, so identical prefixes give identical
    payloads and distance-0 pairs EVEN ACROSS CONTAINERS — exactly the
    md5-equality self-join DuckDB replays. Registered outside the
    graded window (the GIF-video slot carries the class);
    driver_sim hash-checks it every run."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import jpeg as J
    from filesystemagent_spark.functions import mkv as MK
    from filesystemagent_spark.functions import mp4 as M4
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import (
        image_features,
        sample_frames,
        video_hash64,
    )

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 58)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                jframes = []
                for f in range(3):
                    raw = b"".join(
                        _hl.sha256(hp.encode() + bytes([f, i])).digest()
                        for i in range(24)
                    )
                    px = _np.frombuffer(raw, dtype=_np.uint8, count=768)
                    jframes.append(
                        J.encode_jpeg(
                            ((px >> 6) * 85).reshape(16, 16, 3), 90
                        )
                    )
                mux = MK.encode_mkv_mjpeg if doc_id % 2 == 0 else (
                    M4.encode_mp4_mjpeg
                )
                rows.append(
                    {"path": str(doc_id), "content": mux(jframes, fps=1.0)}
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    vids = docs.mapInPandas(gen, "path string, content binary")
    frames = sample_frames(vids, every_s=1.0, max_frames=8)
    feats = image_features(frames.select("path", F.col("frame").alias("content")))
    vh = video_hash64(feats.select("path", "dhash64"))
    keyed = vh.select(
        F.col("path").cast("long").alias("doc_id"), "video_hash64"
    )
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "video_hash64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_jpeg_roundtrip_dedup",
    tags=("multimodal", "jpeg", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 55)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_jpeg_roundtrip_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode at gate scale: each doc's 55-char-prefix
    md5 expands to a deterministic 16x16 RGB image, encoded to REAL
    baseline JPEG bytes (functions/jpeg.encode_jpeg — 4:2:0, the
    photo-camera layout), decoded + perceptually hashed by the
    production `image_features` ladder (pure-numpy Huffman/IDCT
    decode, `decoder='jpeg-pure'`), then deduped by the banded
    Hamming join. JPEG is lossy but byte-DETERMINISTIC: identical
    prefixes give identical JPEGs give identical dhashes, so the
    distance-0 pair set equals the md5-equality self-join DuckDB
    computes. Registered outside the graded window (the PNG and
    GIF-video slots already carry the multimodal classes);
    driver_sim hash-checks it every run."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import jpeg as J
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import image_features

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 55)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = b"".join(
                    _hl.sha256(hp.encode() + bytes([i])).digest() for i in range(24)
                )
                rgb = _np.frombuffer(raw, dtype=_np.uint8, count=768).reshape(
                    16, 16, 3
                )
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": J.encode_jpeg(rgb, quality=90, subsampling="420"),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    imgs = docs.mapInPandas(gen, "path string, content binary")
    feats = image_features(imgs).select(
        F.col("path").cast("long").alias("doc_id"), "dhash64", "decoder"
    )
    pairs = hamming_near_dup_pairs(feats, "doc_id", "dhash64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_wav_audio_dedup",
    tags=("multimodal", "audio", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 45)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_wav_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + fingerprint dedup, oracle-checked
    (completes the multimodal dedup triple beside the PNG-image and
    GIF-video queries): each doc's 45-char-prefix md5 synthesizes a
    deterministic 1-second 8-tone mixture, companded to G.711 mu-law
    WAV bytes (functions/audio.encode_wav — so the production G.711
    expander is in the hot path), fingerprinted by
    `audio_fingerprints` (RIFF parse -> mono decode -> spectral
    band-energy sign hash), and deduped by the banded Hamming join on
    the window-0 fingerprint. Identical prefixes give byte-identical
    WAVs give identical fingerprints — the distance-0 pair set DuckDB
    oracles as an md5 equality self-join. Distinct random tone
    mixtures land far apart in fingerprint space (~20-32 bits
    observed); <=2-bit collisions are absent at gate scale and the
    sf0.1 sweep re-checks it.

    Scale shape: synthesis+decode+FFT is linear mapInPandas work; the
    only shuffle is the band join."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import audio as AU
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import audio_fingerprints

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 45)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    RATE = 4000

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        # 8 segments of RATE/8 samples — one per fingerprint frame —
        # each with its own tone set, so the signal is non-stationary
        # (like real audio) and all 64 fingerprint bits carry entropy
        seg_len = RATE // 8
        t = _np.linspace(0, seg_len / RATE, seg_len, endpoint=False)
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = _np.frombuffer(
                    b"".join(
                        _hl.sha256(hp.encode() + bytes([i])).digest()
                        for i in range(6)
                    ),
                    dtype="<u2",
                )  # 96 u16 values: 8 segments x 4 tones x (f, a, p)
                segs = []
                for s in range(8):
                    block = raw[s * 12 : (s + 1) * 12]
                    freqs = 300.0 + (block[:4] % 1600)  # < Nyquist
                    amps = 0.05 + (block[4:8] % 1000) / 8000.0
                    phases = (block[8:12] % 6283) / 1000.0
                    seg = _np.zeros_like(t)
                    for f_, a_, p_ in zip(freqs, amps, phases):
                        seg += a_ * _np.sin(2 * _np.pi * f_ * t + p_)
                    segs.append(seg)
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": AU.encode_wav(
                            _np.concatenate(segs), RATE, AU.WAVE_MULAW
                        ),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    wavs = docs.mapInPandas(gen, "path string, content binary")
    fps = audio_fingerprints(wavs, window_s=1.0).where(F.col("window_index") == 0)
    keyed = fps.select(F.col("path").cast("long").alias("doc_id"), "fp64")
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "fp64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_mp3_envelope_dedup",
    tags=("multimodal", "audio", "mp3", "dedup", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 48)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_mp3_envelope_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 mp3 ENVELOPE rung end-to-end and oracle-checked:
    each doc's 48-char-prefix md5 drives 16 granules of caller-chosen
    global_gain + scale factors encoded as standard-conformant CBR
    Layer III silence frames (functions/mp3.encode_mp3_silence), which
    the production audio ladder fingerprints WITHOUT any PCM decode —
    `audio_fingerprints` parses side info + bit reservoir + scale
    factors off the bitstream ('mp3-envelope-pure') and hashes the
    coded spectral envelope with the same sign-of-adjacent-band
    scheme as the PCM rungs — then the banded Hamming join pairs the
    window-0 fingerprints. Identical prefixes give byte-identical
    streams give identical fingerprints (the honest scope of envelope
    fingerprinting: exact/near-exact STREAM dedup), so the distance-0
    pair set equals the md5-equality self-join DuckDB computes;
    distinct md5-random envelopes differ in ~half the 64 sign bits.

    Scale shape: encode+parse is linear mapInPandas work; the only
    shuffle is the band join."""
    import hashlib as _hl
    from collections.abc import Iterator

    import pandas as _pd

    from filesystemagent_spark.functions import mp3 as M3
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import audio_fingerprints

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 48)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = b"".join(
                    _hl.sha256(hp.encode() + bytes([i])).digest()
                    for i in range(11)
                )  # 352 bytes: 16 granules x (1 gain + 21 scalefacs)
                gains, sfs = [], []
                for g in range(16):
                    blk = raw[g * 22 : (g + 1) * 22]
                    gains.append(blk[0])
                    sfs.append(
                        [
                            blk[1 + b] % (16 if b < 11 else 8)
                            for b in range(21)
                        ]
                    )
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": M3.encode_mp3_silence(
                            gains, rate=48000, scalefacs=sfs
                        ),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    streams = docs.mapInPandas(gen, "path string, content binary")
    fps = audio_fingerprints(streams, window_s=0.1).where(
        F.col("window_index") == 0
    )
    keyed = fps.select(F.col("path").cast("long").alias("doc_id"), "fp64")
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "fp64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_mp1_audio_dedup",
    tags=("multimodal", "audio", "dedup", "lossy-codec", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 45)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_mp1_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `doc_wav_audio_dedup` pipeline routed through the LOSSY
    MPEG-1 Layer I codec (functions/mpa.py): each doc's 45-char-prefix
    md5 synthesizes a deterministic half-second 32 kHz tone mixture,
    Layer-I-encoded (analysis filterbank + scalefactor quantization),
    then decoded and fingerprinted by the production audio ladder
    (is_mpa -> decode_mpa -> spectral band-energy hash) and deduped by
    the banded Hamming join. Identical prefixes give byte-identical
    .mp1 streams give identical fingerprints — the distance-0 pair set
    DuckDB oracles as an md5 equality self-join; the coding noise
    (~55 dB below signal) cannot split an identical pair and does not
    pull distinct tone mixtures (~20+ bits apart) under the 2-bit
    threshold.

    Scale shape: synthesis+codec+FFT is linear mapInPandas work; the
    only shuffle is the band join."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import mpa as MP
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import audio_fingerprints

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 45)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    RATE = 32000  # Layer I requires 32/44.1/48 kHz
    DUR = RATE // 2

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        seg_len = DUR // 8  # one tone set per fingerprint frame
        t = _np.linspace(0, seg_len / RATE, seg_len, endpoint=False)
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = _np.frombuffer(
                    b"".join(
                        _hl.sha256(hp.encode() + bytes([i])).digest()
                        for i in range(6)
                    ),
                    dtype="<u2",
                )  # 96 u16 values: 8 segments x 4 tones x (f, a, p)
                segs = []
                for s in range(8):
                    block = raw[s * 12 : (s + 1) * 12]
                    freqs = 300.0 + (block[:4] % 12000)  # < 16 kHz Nyquist
                    amps = 0.05 + (block[4:8] % 1000) / 8000.0
                    phases = (block[8:12] % 6283) / 1000.0
                    seg = _np.zeros_like(t)
                    for f_, a_, p_ in zip(freqs, amps, phases):
                        seg += a_ * _np.sin(2 * _np.pi * f_ * t + p_)
                    segs.append(seg)
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": MP.encode_mpa(_np.concatenate(segs), RATE),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    mp1s = docs.mapInPandas(gen, "path string, content binary")
    fps = audio_fingerprints(mp1s, window_s=DUR / RATE).where(
        F.col("window_index") == 0
    )
    keyed = fps.select(F.col("path").cast("long").alias("doc_id"), "fp64")
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "fp64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_mp2_audio_dedup",
    tags=("multimodal", "audio", "dedup", "lossy-codec", "mapInPandas"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 55)) AS hp FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS distance
FROM h a JOIN h b ON a.hp = b.hp AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
)
def doc_mp2_audio_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`doc_mp1_audio_dedup` moved up one codec rung: the same
    synthesize -> encode -> production-ladder-decode -> fingerprint ->
    banded-Hamming-dedup pipeline, but through MPEG-1 LAYER II at
    44.1 kHz — the dominant real-world music rate, which selects
    allocation table B.2b (sblimit 30, round 5; functions/mpa.py) with
    the grouped 5-level class live on subbands 23-29 of every frame.
    Identical 55-char prefixes give byte-identical .mp2 streams give
    identical fingerprints; the oracle replays the distance-0 pair set
    as an md5 equality self-join. Closes the round-4 'missing #1' item
    down to mp3/mp4 only."""
    import hashlib as _hl
    from collections.abc import Iterator

    import numpy as _np
    import pandas as _pd

    from filesystemagent_spark.functions import mpa as MP
    from filesystemagent_spark.operators.dedup import hamming_near_dup_pairs
    from filesystemagent_spark.operators.multimodal import audio_fingerprints

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.md5(F.substring("text", 1, 55)).alias("hp")
    ).repartition(spark.sparkContext.defaultParallelism)

    RATE = 44100  # selects table B.2b — the 44.1 kHz high-rate regime
    DUR = (RATE // 2 // 1152) * 1152  # whole Layer II frames

    def gen(batches: Iterator[_pd.DataFrame]) -> Iterator[_pd.DataFrame]:
        seg_len = DUR // 8
        t = _np.linspace(0, seg_len / RATE, seg_len, endpoint=False)
        for pdf in batches:
            rows = []
            for doc_id, hp in zip(pdf["doc_id"], pdf["hp"]):
                raw = _np.frombuffer(
                    b"".join(
                        _hl.sha256(hp.encode() + bytes([i])).digest()
                        for i in range(6)
                    ),
                    dtype="<u2",
                )
                segs = []
                for s in range(8):
                    block = raw[s * 12 : (s + 1) * 12]
                    freqs = 300.0 + (block[:4] % 12000)  # inside B.2b passband
                    amps = 0.05 + (block[4:8] % 1000) / 8000.0
                    phases = (block[8:12] % 6283) / 1000.0
                    seg = _np.zeros_like(t)
                    for f_, a_, p_ in zip(freqs, amps, phases):
                        seg += a_ * _np.sin(2 * _np.pi * f_ * t + p_)
                    segs.append(seg)
                rows.append(
                    {
                        "path": str(doc_id),
                        "content": MP.encode_mp2(_np.concatenate(segs), RATE),
                    }
                )
            yield _pd.DataFrame(rows, columns=["path", "content"])

    mp2s = docs.mapInPandas(gen, "path string, content binary")
    fps = audio_fingerprints(mp2s, window_s=DUR / RATE).where(
        F.col("window_index") == 0
    )
    keyed = fps.select(F.col("path").cast("long").alias("doc_id"), "fp64")
    pairs = hamming_near_dup_pairs(keyed, "doc_id", "fp64", max_distance=2)
    return pairs.select(
        "id_a", "id_b", F.col("distance").cast("int").alias("distance")
    ).orderBy("id_a", "id_b")


@register(
    "doc_transform_shim",
    tags=("udf", "transform", "mapInPandas"),
    oracle="""
SELECT doc_id, lang, n_chars, CAST(n_chars >= 200 AS BOOLEAN) AS is_long
FROM documents
WHERE lang = 'en' AND text IS NOT NULL
ORDER BY doc_id
""",
)
def doc_transform_shim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: a reference-style pandas transform (dropna → equality filter
    → derived column) executed through the distributed transform_pandas
    shim — the mapInPandas machinery itself is what the oracle checks,
    since the same relational result must come out of DuckDB."""
    from filesystemagent_spark.operators.transform import transform_pandas

    docs = Catalog(spark, sf_dir).documents.select("doc_id", "text", "lang", "n_chars")

    def fn(pdf, params):
        out = pdf.dropna(subset=["text", "lang"])
        out = out[out["lang"] == params["filter_value"]].copy()
        out["is_long"] = out["n_chars"] >= 200
        return out.drop(columns=["text"])

    got = transform_pandas(
        docs, fn, "doc_id long, lang string, n_chars long, is_long boolean",
        {"filter_value": "en"},
    )
    return got.orderBy("doc_id")


@register(
    "doc_media_features",
    tags=("multimodal", "mapInPandas"),
    # The STUB decode is content-hash-defined (sha256(salt+bytes)), so
    # even the pandas-UDF path is fully oracle-checkable: DuckDB
    # recomputes the same hashes over the same bytes. (sha256(VARCHAR)
    # hashes the UTF-8 bytes — identical input to the stub's
    # salt+encode(text).) If a real decoder (PIL) ever appears in the
    # container, decoder='pil' values replace the stub and this oracle
    # must be dropped back to rows-only.
    oracle="""
WITH feats AS (
    SELECT substr(sha256('phash' || text), 1, 16) AS phash_hex,
           64 + octet_length(encode(text)) % 1024 AS width
    FROM documents
)
SELECT COUNT(*) AS n_decoded,
       COUNT(DISTINCT phash_hex) AS n_distinct_phash,
       CAST(MIN(width) AS INT) AS min_width,
       CAST(MAX(width) AS INT) AS max_width
FROM feats
""",
)
def doc_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing over driver data: treat each document's text
    bytes as an opaque binary payload, run the image feature extractor
    (stub decode in this container), and aggregate — exercising binary
    columns through Arrow batches at gate scale."""
    from filesystemagent_spark.operators.multimodal import image_features

    docs = Catalog(spark, sf_dir).documents.select(
        F.concat(F.col("doc_id").cast("string"), F.lit(".jpg")).alias("path"),
        F.encode("text", "UTF-8").alias("content"),
    )
    feats = image_features(docs)
    return feats.agg(
        F.count("*").alias("n_decoded"),
        F.count_distinct("phash64").alias("n_distinct_phash"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
    )


@register(
    "doc_dup_clusters",
    tags=("dedup", "clustering", "graph"),
    oracle="""
WITH h AS (
    SELECT doc_id, md5(substr(text, 1, 40)) AS hp FROM documents
),
g AS (
    SELECT hp, MIN(doc_id) AS cluster_id, COUNT(*) AS n
    FROM h GROUP BY hp
)
SELECT h.doc_id AS id, g.cluster_id
FROM h JOIN g USING (hp)
WHERE g.n > 1
ORDER BY id
""",
)
def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the near-dup pair graph (min-label
    propagation), filtered to real duplicate groups (>= 2 members).

    At distance 0 the components are exactly the hash-equality
    classes, so DuckDB can oracle the labels as per-group MIN(doc_id)
    — which pins the distributed label propagation to the correct
    fixpoint. Chain-topology components (a-b, b-c with no a-c edge)
    are covered by constructed-graph unit tests (tests/test_dedup.py),
    where no equality oracle exists."""
    from filesystemagent_spark.operators.dedup import (
        hamming_near_dup_pairs,
        near_dup_clusters,
    )

    docs = Catalog(spark, sf_dir).documents.select(
        "doc_id", _hash60(F.substring("text", 1, 40)).alias("h60")
    )
    pairs = hamming_near_dup_pairs(docs, "doc_id", "h60", max_distance=2)
    labels = near_dup_clusters(docs.select("doc_id"), pairs, id_col="doc_id")
    groups = (
        labels.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
        .select("cluster_id")
    )
    return (
        labels.join(F.broadcast(groups), "cluster_id")
        .select(F.col("id"), F.col("cluster_id"))
        .orderBy("id")
    )
