"""Multimodal columns (SURVEY.md §2.7 F2-F5; media fingerprinting at
/root/reference/src/media_fingerprinting.py) + the training-pipeline
extensions: image/audio/video as opaque BINARY columns with typed
metadata, processed by Arrow-batched pandas transforms.

Codec ladder: PIL/imagehash when importable; otherwise PNG decodes
for REAL via the pure-stdlib codec (functions/png.py — zlib inflate,
spec unfiltering, luminance, area-resample dhash/phash/ahash) and WAV
via the stdlib `wave` module. Only formats that genuinely need
external codec libraries (JPEG/mp3/video) fall back to a
clearly-marked DETERMINISTIC STUB (content-hash-derived values) that
keeps the Spark-side plumbing — schemas, mapInPandas signatures,
batch shapes, partitioning — real and testable. Stub values are
stable across runs and engines, so oracle checks remain meaningful.

Scale notes: binary payloads ride in the `content` column; at 100 TB
decode cost dominates, so every transform here is mapInPandas (one
Python worker round-trip per Arrow batch) and perceptual hashes are
computed once then joined/banded — never pairwise O(n²) like the
reference's find_duplicates loop (media_fingerprinting.py:278-310).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# F5: media-type classification by extension
# (/root/reference/src/media_fingerprinting.py:87-98 — 20 image,
# 28 video extensions)
IMAGE_EXTENSIONS = (
    "jpg", "jpeg", "png", "gif", "bmp", "tiff", "tif", "webp", "svg",
    "ppm", "pgm", "pbm", "pnm",
    "ico", "psd", "raw", "cr2", "nef", "orf", "sr2", "arw", "dng",
    "heic", "heif",
)
VIDEO_EXTENSIONS = (
    "mp4", "avi", "y4m", "mov", "wmv", "flv", "webm", "mkv", "m4v", "3gp",
    "3g2", "mts", "m2ts", "ts", "vob", "ogv", "dv", "rm", "rmvb",
    "asf", "amv", "mpg", "mpeg", "mpv", "m2v", "f4v", "f4p", "f4a", "f4b",
)
AUDIO_EXTENSIONS = ("mp3", "mp2", "mp1", "wav", "flac", "ogg", "m4a", "aac", "wma", "opus")


def media_type(path: Column) -> Column:
    """'image' | 'video' | 'audio' | null from the file extension
    (media_fingerprinting.py:109-123, audio added as an extension)."""
    ext = F.lower(F.element_at(F.split(path, r"\."), -1))
    return (
        F.when(ext.isin(*IMAGE_EXTENSIONS), "image")
        .when(ext.isin(*VIDEO_EXTENSIONS), "video")
        .when(ext.isin(*AUDIO_EXTENSIONS), "audio")
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract

IMAGE_META = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("dhash64", T.LongType()),
        T.StructField("phash64", T.LongType()),
        T.StructField("ahash64", T.LongType()),
        T.StructField("whash64", T.LongType()),
        T.StructField("decoder", T.StringType()),  # 'pil' | 'stub'
    ]
)


def _stub_u64(content: bytes, salt: bytes) -> int:
    """Deterministic 64-bit value from content — the STUB decode path.
    Signed so it fits Spark LongType."""
    h = hashlib.sha256(salt + content).digest()
    return int.from_bytes(h[:8], "big", signed=True)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401
        import imagehash  # noqa: F401

        return True
    except ImportError:
        return False


def image_features(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Decode + perceptual-hash each image (F2: dhash/phash/ahash/whash as
    64-bit longs — BIGINT so near-dup joins use bit_count(h1^h2), not
    hex-string UDFs).

    Decoder ladder, best available wins per row:
      1. PIL + imagehash when importable (absent in this container);
      2. the pure-stdlib PNG codec (functions/png.py) — REAL decode +
         real dhash/phash/ahash for PNG bytes, `decoder='png-pure'`;
      3. the pure-stdlib GIF decoder (functions/gif.py, LZW included),
         `decoder='gif-pure'`;
      4. the pure-stdlib BMP decoder (functions/bmp.py),
         `decoder='bmp-pure'`;
      5. the pure-numpy baseline JPEG decoder (functions/jpeg.py —
         Huffman + IDCT, 4:4:4/4:2:2/4:2:0, grayscale, restarts),
         `decoder='jpeg-pure'`;
      6. netpbm P1-P6 (functions/pnm.py), `decoder='pnm-pure'`;
      7. baseline TIFF, both byte orders, none/PackBits strips
         (functions/tiff.py), `decoder='tiff-pure'`;
      8. ICO/CUR containers — largest entry, PNG or 24/32-bit DIB
         payload (functions/ico.py), `decoder='ico-pure'`;
      9. deterministic stub (content-hash-derived) with
         `decoder='stub'` so downstream code can tell.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _pil_available()
        from filesystemagent_spark.functions import bmp as B
        from filesystemagent_spark.functions import gif as G
        from filesystemagent_spark.functions import ico as IC
        from filesystemagent_spark.functions import jpeg as J
        from filesystemagent_spark.functions import png as P
        from filesystemagent_spark.functions import pnm as N
        from filesystemagent_spark.functions import tiff as TF

        for pdf in batches:
            out: list[dict[str, Any]] = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if use_pil:
                    import io

                    import imagehash
                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(b))
                        out.append(
                            {
                                "path": path,
                                "width": img.width,
                                "height": img.height,
                                "mode": img.mode,
                                "dhash64": _hex_to_i64(str(imagehash.dhash(img))),
                                "phash64": _hex_to_i64(str(imagehash.phash(img))),
                                "ahash64": _hex_to_i64(str(imagehash.average_hash(img))),
                                "whash64": _hex_to_i64(str(imagehash.whash(img))),
                                "decoder": "pil",
                            }
                        )
                        continue
                    except Exception:
                        pass  # fall through for undecodable bytes
                pure = (
                    (P.decode_png, "png-pure") if P.is_png(b)
                    else (G.decode_gif, "gif-pure") if G.is_gif(b)
                    else (B.decode_bmp, "bmp-pure") if B.is_bmp(b)
                    else (J.decode_jpeg, "jpeg-pure") if J.is_jpeg(b)
                    else (N.decode_pnm, "pnm-pure") if N.is_pnm(b)
                    else (TF.decode_tiff, "tiff-pure") if TF.is_tiff(b)
                    else (IC.decode_ico, "ico-pure") if IC.is_ico(b)
                    else None
                )
                if pure is not None:
                    decode, label = pure
                    try:
                        w, h, mode, rgb = decode(b)
                        gray = P.luminance(rgb)
                        out.append(
                            {
                                "path": path,
                                "width": w,
                                "height": h,
                                "mode": mode,
                                "dhash64": P.dhash64(gray),
                                "phash64": P.phash64(gray),
                                "ahash64": P.ahash64(gray),
                                "whash64": P.whash64(gray),
                                "decoder": label,
                            }
                        )
                        continue
                    except ValueError:
                        pass  # unsupported variant -> stub
                out.append(
                    {
                        "path": path,
                        # STUB: pseudo-dimensions derived from content size
                        "width": 64 + len(b) % 1024,
                        "height": 64 + (len(b) // 7) % 1024,
                        "mode": "RGB",
                        "dhash64": _stub_u64(b, b"dhash"),
                        "phash64": _stub_u64(b, b"phash"),
                        "ahash64": _stub_u64(b, b"ahash"),
                        "whash64": _stub_u64(b, b"whash"),
                        "decoder": "stub",
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in IMAGE_META.fields])

    return df.select(path_col, content_col).mapInPandas(run, IMAGE_META)


def _hex_to_i64(hex_str: str) -> int:
    return int.from_bytes(bytes.fromhex(hex_str)[:8].ljust(8, b"\0"), "big", signed=True)


RESIZED = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame, width: int, height: int,
    path_col: str = "path", content_col: str = "content",
) -> DataFrame:
    """Resize transform. Decoder ladder as in `image_features`: PIL,
    then the pure PNG/JPEG codecs (area-average resample per channel,
    re-encoded as PNG — a REAL binary-in/binary-out transform), then a
    deterministic stub payload so the pipeline shape is exercised
    end-to-end even without codecs."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _pil_available()
        from filesystemagent_spark.functions import jpeg as J
        from filesystemagent_spark.functions import png as P

        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if use_pil:
                    import io

                    from PIL import Image

                    try:
                        img = Image.open(io.BytesIO(b)).resize((width, height))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        out.append({"path": path, "content": buf.getvalue(),
                                    "width": width, "height": height, "decoder": "pil"})
                        continue
                    except Exception:
                        pass
                if P.is_png(b) or J.is_jpeg(b):
                    try:
                        decode = P.decode_png if P.is_png(b) else J.decode_jpeg
                        _w, _h, _mode, rgb = decode(b)
                        resized = np.stack(
                            [
                                np.clip(
                                    np.rint(
                                        P.resize_area(
                                            rgb[:, :, ch].astype(np.float64),
                                            width,
                                            height,
                                        )
                                    ),
                                    0,
                                    255,
                                )
                                for ch in range(3)
                            ],
                            axis=2,
                        ).astype(np.uint8)
                        out.append({"path": path, "content": P.encode_png(resized),
                                    "width": width, "height": height,
                                    "decoder": "png-pure" if P.is_png(b) else "jpeg-pure"})
                        continue
                    except ValueError:
                        pass
                fake = hashlib.sha256(b + f"|{width}x{height}".encode()).digest()
                out.append({"path": path, "content": fake, "width": width,
                            "height": height, "decoder": "stub"})
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED.fields])

    return df.select(path_col, content_col).mapInPandas(run, RESIZED)


FRAME = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("timestamp_s", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame, every_s: float = 1.0, max_frames: int = 16,
    path_col: str = "path", content_col: str = "content",
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (a flatMap —
    mapInPandas yields more rows than it consumes).

    Animated GIF decodes for REAL (functions/gif.decode_gif_frames —
    LZW, compositing, per-frame delays): frames are sampled on the
    animation's own timeline at `every_s` spacing (always including
    t=0) and each sampled frame is re-encoded as PNG bytes, so
    downstream `image_features` consumes them like any other image —
    `decoder='gif-pure'`. MJPEG AVI also decodes for REAL
    (functions/avi.py parses the RIFF container; each sampled frame
    is already JPEG bytes the image ladder decodes) —
    `decoder='avi-mjpeg-pure'` — and so do MJPEG-in-MP4
    (functions/mp4.py walks the ISO-BMFF sample tables) —
    `decoder='mp4-mjpeg-pure'` — and MJPEG-in-MKV (functions/mkv.py
    walks the EBML Cluster/SimpleBlock stream; round 8) —
    `decoder='mkv-mjpeg-pure'`. Codecs that genuinely need external
    decoders (H.264/HEVC/VP9 in mp4 or mkv) keep the deterministic
    stub (1 frame per 64 KiB), preserving the 1→N explode shape real
    decode has.

    Reference parity: media_fingerprinting.py:166-179 hashes videos
    via frame sampling with the videohash package; this operator is
    the sampling half, `video_hash64` the hash half."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from filesystemagent_spark.functions import avi as A
        from filesystemagent_spark.functions import gif as G
        from filesystemagent_spark.functions import mkv as MK
        from filesystemagent_spark.functions import mp4 as M4
        from filesystemagent_spark.functions import png as P
        from filesystemagent_spark.functions import y4m as Y

        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if Y.is_y4m(b):
                    try:
                        fps, yframes = Y.decode_y4m_frames(b, max_frames=4096)
                    except ValueError:
                        yframes = None
                    if yframes is not None:
                        # uniform timeline, like the AVI branch; frames
                        # re-encode as PNG for the image ladder
                        step = max(1, int(round(every_s * fps)))
                        for idx, fi in enumerate(
                            range(0, len(yframes), step)[:max_frames]
                        ):
                            out.append(
                                {
                                    "path": path,
                                    "frame_index": idx,
                                    "timestamp_s": fi / fps,
                                    "frame": P.encode_png(yframes[fi]),
                                    "decoder": "y4m-pure",
                                }
                            )
                        continue
                if M4.is_mp4(b):
                    try:
                        fps, jframes = M4.decode_mp4_mjpeg(b, max_frames=4096)
                    except ValueError:
                        jframes = None  # avc1/hev1/... -> stub rung below
                    if jframes is not None:
                        step = max(1, int(round(every_s * fps)))
                        for idx, fi in enumerate(
                            range(0, len(jframes), step)[:max_frames]
                        ):
                            out.append(
                                {
                                    "path": path,
                                    "frame_index": idx,
                                    "timestamp_s": fi / fps,
                                    "frame": jframes[fi],
                                    "decoder": "mp4-mjpeg-pure",
                                }
                            )
                        continue
                if MK.is_mkv(b):
                    try:
                        fps, jframes = MK.decode_mkv_mjpeg(b, max_frames=4096)
                    except ValueError:
                        jframes = None  # V_MPEG4/V_VP9/laced -> stub rung
                    if jframes is not None:
                        step = max(1, int(round(every_s * fps)))
                        for idx, fi in enumerate(
                            range(0, len(jframes), step)[:max_frames]
                        ):
                            out.append(
                                {
                                    "path": path,
                                    "frame_index": idx,
                                    "timestamp_s": fi / fps,
                                    "frame": jframes[fi],
                                    "decoder": "mkv-mjpeg-pure",
                                }
                            )
                        continue
                if A.is_avi(b):
                    try:
                        fps, jframes = A.decode_avi_mjpeg(b, max_frames=4096)
                    except ValueError:
                        jframes = None
                    if jframes is not None:
                        # uniform timeline: frame i at i/fps; sample
                        # every `every_s`, emitting the JPEG payload
                        # as-is (the image ladder decodes JPEG)
                        step = max(1, int(round(every_s * fps)))
                        for idx, fi in enumerate(
                            range(0, len(jframes), step)[:max_frames]
                        ):
                            out.append(
                                {
                                    "path": path,
                                    "frame_index": idx,
                                    "timestamp_s": fi / fps,
                                    "frame": jframes[fi],
                                    "decoder": "avi-mjpeg-pure",
                                }
                            )
                        continue
                if G.is_gif(b):
                    try:
                        frames = G.decode_gif_frames(b, max_frames=256)
                    except ValueError:
                        frames = None
                    if frames is not None:
                        # animation timeline: frame i covers
                        # [start_i, start_i + delay_i); sample at
                        # k*every_s, taking the frame active then
                        starts = []
                        t = 0.0
                        for delay, _rgb in frames:
                            starts.append(t)
                            t += delay if delay > 0 else every_s
                        total = t
                        picked: list[tuple[int, float]] = []
                        k = 0
                        while len(picked) < max_frames:
                            ts = k * every_s
                            if ts >= total and k > 0:
                                break
                            fi = max(
                                i for i, s in enumerate(starts) if s <= ts
                            )
                            if not picked or picked[-1][0] != fi:
                                picked.append((fi, ts))
                            k += 1
                        for idx, (fi, ts) in enumerate(picked):
                            out.append(
                                {
                                    "path": path,
                                    "frame_index": idx,
                                    "timestamp_s": ts,
                                    "frame": P.encode_png(frames[fi][1]),
                                    "decoder": "gif-pure",
                                }
                            )
                        continue
                # STUB: pretend 1 frame per 64 KiB of payload
                n = min(max_frames, max(1, len(b) // 65536 + 1))
                for i in range(n):
                    out.append(
                        {
                            "path": path,
                            "frame_index": i,
                            "timestamp_s": i * every_s,
                            "frame": hashlib.sha256(b + i.to_bytes(4, "big")).digest(),
                            "decoder": "stub",
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME.fields])

    return df.select(path_col, content_col).mapInPandas(run, FRAME)


def video_hash64(
    frame_hashes: DataFrame, path_col: str = "path", hash_col: str = "dhash64"
) -> DataFrame:
    """Per-video 64-bit hash from per-frame perceptual hashes by
    BIT-MAJORITY vote — the classic temporally-robust video
    fingerprint (reference media_fingerprinting.py:166-179 delegates
    to the videohash package, which is the same construction: frame
    hashes collapsed into one).

    Entirely JVM-side: 64 conditional sums (one per bit position)
    built as a single SQL expression string (thousands of py4j Column
    calls cost driver seconds — SCALE.md round-3 lesson), then the
    majority bits reassembled with shiftleft/bor. One shuffle on
    `path`; state per group is 64 longs. Ties (exactly half) round
    DOWN to 0 so single-frame videos hash to their frame hash.

    Returns (path, video_hash64 BIGINT, n_frames)."""
    grouped = frame_hashes.groupBy(path_col).agg(
        F.count("*").alias("n_frames"),
        *[
            F.expr(f"sum(CAST((`{hash_col}` >> {i}) & 1 AS INT)) AS b{i}")
            for i in range(64)
        ],
    )
    majority = " | ".join(
        f"(CAST(IF(2 * b{i} > n_frames, 1, 0) AS BIGINT) << {i})" for i in range(64)
    )
    return grouped.select(
        path_col,
        F.expr(majority).alias("video_hash64"),
        F.col("n_frames"),
    )


AUDIO_META = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
        # 'wav-pure' | 'wav-ulaw-pure' | 'wav-alaw-pure' | 'wav-adpcm-pure'
        T.StructField("decoder", T.StringType()),
    ]
)


def audio_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Audio decode + basic features per Arrow batch.

    RIFF/WAVE decodes for REAL via functions/audio.py — PCM 8/16-bit,
    G.711 mu-law/A-law, and IMA ADPCM (`decoder` distinguishes them:
    'wav-pure' / 'wav-ulaw-pure' / 'wav-alaw-pure' /
    'wav-adpcm-pure') — FLAC via functions/flac.py ('flac-pure') —
    and MPEG-1 Layer I + Layer II via functions/mpa.py ('mp1-pure' /
    'mp2-pure', the perceptually-coded members of the ladder; Layer II
    covers the 48 kHz B.2a regime) — yielding duration, sample rate,
    channels, RMS (normalized to [-1,1]) and zero-crossing rate of the
    channel-mean signal. Formats whose spec tables have no closed form
    (mp3 Huffman / ogg) genuinely need codec libs: with soundfile
    importable they'd decode the same way; without it they raise
    NotImplementedError — honestly, not a fake number."""
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from filesystemagent_spark.functions import audio as AU
        from filesystemagent_spark.functions import flac as FL
        from filesystemagent_spark.functions import mpa as MP

        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if AU.is_wav(b):
                    sr, nch, x, label = AU.decode_wav(b)
                elif FL.is_flac(b):
                    sr, nch, x, label = FL.decode_flac(b)
                elif MP.is_mpa(b):
                    sr, nch, x, label = MP.decode_mpa(b)
                else:
                    raise NotImplementedError(
                        "mp3/ogg audio decode requires a codec library "
                        "(soundfile); not available in this environment"
                    )
                rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if len(x) > 1
                    else 0.0
                )
                out.append(
                    {
                        "path": path,
                        "duration_s": len(x) / sr if sr else 0.0,
                        "sample_rate": sr,
                        "n_channels": nch,
                        "rms": rms,
                        "zero_cross_rate": zcr,
                        "decoder": label,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_META.fields])

    return df.select(path_col, content_col).mapInPandas(run, AUDIO_META)


AUDIO_FP = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("window_index", T.IntegerType()),
        T.StructField("fp64", T.LongType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _spectral_fp64(x, rate: int) -> int:
    """64-bit spectral fingerprint of one audio window: 8 time frames
    x 9 log-spaced band energies; each bit is the sign of the
    adjacent-band energy difference (the Haitsma-Kalker band-energy
    scheme reduced to frequency differences). Deterministic numpy,
    robust to volume scaling (signs survive any positive gain)."""
    import numpy as np

    n = (len(x) // 8) * 8
    if n < 16:
        return 0
    frames = np.asarray(x[:n], dtype=np.float64).reshape(8, -1)
    frame_len = frames.shape[1]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    n_bins = spec.shape[1]
    # skip DC / rumble below 300 Hz; bin spacing is rate / frame_len
    lo = int(round(300.0 * frame_len / rate))
    lo = max(1, min(lo, max(1, n_bins - 11)))
    edges = np.unique(np.geomspace(lo, n_bins - 1, 10).astype(int))
    while len(edges) < 10:  # degenerate tiny windows: pad linearly
        edges = np.unique(np.append(edges, edges[-1] + 1))
    bands = np.stack(
        [spec[:, a:b].sum(axis=1) for a, b in zip(edges[:-1], edges[1:])],
        axis=1,
    )  # (8, 9)
    diffs = bands[:, :-1] - bands[:, 1:]  # (8, 8)
    bits = (diffs > 0).reshape(-1)
    out = 0
    for i, bit in enumerate(bits):
        if bit:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def audio_fingerprints(
    df: DataFrame, window_s: float = 1.0,
    path_col: str = "path", content_col: str = "content",
) -> DataFrame:
    """Per-window 64-bit audio fingerprints (the audio analogue of
    `image_features`' dhash — reference media_fingerprinting.py
    fingerprints images/videos; audio completes the multimodal dedup
    triple): decode RIFF/WAVE via functions/audio.py (PCM, G.711,
    IMA ADPCM), split the mono signal into `window_s` windows, and
    hash each with `_spectral_fp64`. Near-duplicate audio is then a
    banded Hamming join on fp64 — identical bytes give identical
    fingerprints regardless of container format. MPEG-1 Layer III
    (round 8) fingerprints from its CODED ENVELOPE — global_gain +
    scale factors parsed straight off the bitstream
    (functions/mp3.py; no PCM is produced, the Huffman gate stays
    shut) — labeled 'mp3-envelope-pure' because its scope is stream
    dedup, not perceptual matching of re-encodes.

    1→N explode shape like `sample_frames`; windows shorter than half
    `window_s` are dropped (no padding artifacts)."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from filesystemagent_spark.functions import audio as AU
        from filesystemagent_spark.functions import flac as FL
        from filesystemagent_spark.functions import mp3 as M3
        from filesystemagent_spark.functions import mpa as MP

        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
                if M3.is_mp3(b):
                    # Layer III: no pure PCM decode (the Huffman gate,
                    # functions/mpa.py) — but the CODED ENVELOPE
                    # (global_gain + scale factors, round 8) yields the
                    # same per-window sign-difference fp64 scheme from
                    # the bitstream itself. Honest scope: exact/
                    # near-exact STREAM dedup, not perceptual match of
                    # re-encodes — hence the distinct decoder label.
                    env = M3.parse_mp3_envelope(b)
                    gpw = max(2, int(round(window_s * env["rate"] / 576)))
                    for wi, fp in enumerate(
                        M3.mp3_envelope_fp64_windows(env, gpw)
                    ):
                        out.append(
                            {
                                "path": path,
                                "window_index": wi,
                                "fp64": fp,
                                "decoder": "mp3-envelope-pure",
                            }
                        )
                    continue
                if AU.is_wav(b):
                    rate, _nch, x, label = AU.decode_wav(b)
                elif FL.is_flac(b):
                    rate, _nch, x, label = FL.decode_flac(b)
                elif MP.is_mpa(b):
                    rate, _nch, x, label = MP.decode_mpa(b)
                else:
                    raise NotImplementedError(
                        "mp3/ogg audio decode requires a codec library "
                        "(soundfile); not available in this environment"
                    )
                step = max(16, int(round(rate * window_s)))
                wi = 0
                for off in range(0, len(x), step):
                    win = x[off : off + step]
                    if len(win) < step // 2:
                        break
                    out.append(
                        {
                            "path": path,
                            "window_index": wi,
                            "fp64": _spectral_fp64(win, rate),
                            "decoder": label,
                        }
                    )
                    wi += 1
            yield pd.DataFrame(out, columns=[f.name for f in AUDIO_FP.fields])

    return df.select(path_col, content_col).mapInPandas(run, AUDIO_FP)


# ---------------------------------------------------------------------------
# F4: Hamming similarity on 64-bit hashes — JVM-side, no UDF


def hamming_distance64(h1: Column, h2: Column) -> Column:
    """bit_count(h1 XOR h2) — Spark 3.3+ builtin, whole-stage codegen."""
    return F.bit_count(h1.bitwiseXOR(h2))


def hamming_similarity64(h1: Column, h2: Column) -> Column:
    """1 - dist/64, the reference's normalized similarity
    (media_fingerprinting.py:255-260 with 16 hex chars * 4 bits)."""
    return 1.0 - hamming_distance64(h1, h2) / F.lit(64.0)
