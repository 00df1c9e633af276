"""Multimodal (image/video/audio) column plumbing.

Driver mandate (BASELINE.json:6): treat media as opaque ``binary``
payload columns with typed metadata, and implement decode /
feature-extract / resize / frame-sample as Arrow-batched pandas
functions over ``mapInPandas``.

No media codecs exist in this container, so the DECODE KERNELS for
real formats are STUBS (``NotImplementedError`` behind an import-try —
see ``decode_image_real``). Everything Spark-side is real and tested:
the binary schema, the deterministic synthetic payload format, the
mapInPandas batch iteration, and the byte-level parsing.

Synthetic payload format (media built 1:1 from ``documents``):

  image (doc_id % 3 < 2):
      bytes 0–3   width  (uint32 big-endian) = 64 + n_chars % 192
      bytes 4–7   height (uint32 big-endian) = 48 + doc_id % 144
      bytes 8–23  md5 digest of the document text (16 raw bytes)
  video (doc_id % 3 == 2):
      bytes 0–3   n_frames (uint32 BE) = 4 + doc_id % 28
      bytes 4–7   fps      (uint32 BE) = 24
      then n_frames × 4-byte frame markers, marker_i = frame index i

Because every field is an arithmetic function of (doc_id, n_chars,
text), the DuckDB oracle can verify the *decoded* outputs without
touching binary — the Spark side must round-trip the real bytes to
match it (T2), which is exactly the plumbing under test.

Reference capability: the reference's FITS load + per-image metadata
bundling (datapipe/io/images.py [UNVERIFIED-PK, SURVEY.md §2.12]) is
this same shape — opaque pixel payload + typed metadata record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

FPS = 24


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the synthetic media table from ``documents``.

    Columns: media_id (= doc_id), kind ('image'|'video'),
    payload (binary, format above), meta (struct declared_width,
    declared_height, n_frames — nullable per kind).

    Payload assembly is pure JVM column algebra (hex strings →
    ``unhex``): no UDF, no collect; at 100 TB this is a narrow map
    stage over the parquet scan.
    """
    d = load(spark, sf_dir, "documents")
    width = (F.lit(64) + F.col("n_chars") % 192).cast("int")
    height = (F.lit(48) + F.col("doc_id") % 144).cast("int")
    n_frames = (F.lit(4) + F.col("doc_id") % 28).cast("int")
    hex4 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731 — uint32 BE hex
    image_payload = F.unhex(F.concat(hex4(width), hex4(height), F.md5("text")))
    frame_markers = F.array_join(
        F.transform(F.sequence(F.lit(0), n_frames - 1), lambda i: F.lpad(F.hex(i), 8, "0")),
        "",
    )
    video_payload = F.unhex(F.concat(hex4(n_frames), hex4(F.lit(FPS)), frame_markers))
    is_image = F.col("doc_id") % 3 < 2
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(is_image, F.lit("image")).otherwise(F.lit("video")).alias("kind"),
        F.when(is_image, image_payload).otherwise(video_payload).alias("payload"),
        F.struct(
            F.when(is_image, width).alias("declared_width"),
            F.when(is_image, height).alias("declared_height"),
            F.when(~is_image, n_frames).alias("n_frames"),
        ).alias("meta"),
    )


def decode_image_real(payload: bytes) -> "object":
    """STUB — real image decode (PNG/JPEG → pixel array).

    The container ships no codec libraries; a deployment with Pillow
    installed gets the real path, everything else fails loudly rather
    than silently producing fake pixels.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "real image decode requires Pillow; this environment ships no "
            "codecs — use the synthetic-header decode path (q_multimodal_decode)"
        ) from exc
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover
