"""Multimodal columns (SURVEY.md §2.7 F2-F5; media fingerprinting at
/root/reference/src/media_fingerprinting.py) + the training-pipeline
extensions: image/audio/video as opaque BINARY columns with typed
metadata, processed by Arrow-batched pandas transforms.

The actual codec libraries (PIL/imagehash/videohash/ffmpeg) are NOT in
this container, so each decode step is import-gated: the real library
is used when importable, otherwise a clearly-marked DETERMINISTIC STUB
(content-hash-derived values) keeps the Spark-side plumbing — schemas,
mapInPandas signatures, batch shapes, partitioning — real and
testable. Stub values are stable across runs and engines, so oracle
checks remain meaningful.

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
    "ico", "psd", "raw", "cr2", "nef", "orf", "sr2", "arw", "dng",
    "heic", "heif",
)
VIDEO_EXTENSIONS = (
    "mp4", "avi", "mov", "wmv", "flv", "webm", "mkv", "m4v", "3gp",
    "3g2", "mts", "m2ts", "ts", "vob", "ogv", "dv", "rm", "rmvb",
    "asf", "amv", "mpg", "mpeg", "mpv", "m2v", "f4v", "f4p", "f4a", "f4b",
)
AUDIO_EXTENSIONS = ("mp3", "wav", "flac", "ogg", "m4a", "aac", "wma", "opus")


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
    """Decode + perceptual-hash each image (F2: dhash/phash/ahash as
    64-bit longs — BIGINT so near-dup joins use bit_count(h1^h2), not
    hex-string UDFs).

    Real path: PIL + imagehash per Arrow batch. Container path: a
    deterministic stub (content-hash-derived dimensions/hashes) with
    `decoder='stub'` so downstream code can tell.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _pil_available()
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
                                "decoder": "pil",
                            }
                        )
                        continue
                    except Exception:
                        pass  # fall through to stub for undecodable bytes
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
    """Resize transform. Real path re-encodes via PIL; stub path emits
    a deterministic payload (sha256 of input ++ target dims) so the
    pipeline shape — binary in, binary out, metadata columns — is
    exercised end-to-end without codecs."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_pil = _pil_available()
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
    mapInPandas yields more rows than it consumes). Without a video
    decoder the stub emits ceil(len/64KiB)-bounded deterministic
    frames, preserving the 1→N explode shape real decode would have."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                b = bytes(content) if content is not None else b""
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


def audio_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Audio decode is NOT implementable in this container (no codec
    libs); the signature and schema are the real plumbing. Raises
    NotImplementedError on execution when no decoder is present."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import soundfile  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "audio decode requires a codec library (soundfile); "
                "not available in this environment"
            ) from e
        yield from ()  # pragma: no cover — real impl would decode here

    return df.select(path_col, content_col).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# F4: Hamming similarity on 64-bit hashes — JVM-side, no UDF


def hamming_distance64(h1: Column, h2: Column) -> Column:
    """bit_count(h1 XOR h2) — Spark 3.3+ builtin, whole-stage codegen."""
    return F.bit_count(h1.bitwiseXOR(h2))


def hamming_similarity64(h1: Column, h2: Column) -> Column:
    """1 - dist/64, the reference's normalized similarity
    (media_fingerprinting.py:255-260 with 16 hex chars * 4 bits)."""
    return 1.0 - hamming_distance64(h1, h2) / F.lit(64.0)
