"""Multimodal decode / frame-sample operators over binary payloads.

The media table (sources/multimodal.py) carries opaque ``binary``
payloads; these operators run REAL byte-level decoding through
``mapInPandas`` (Arrow batches of binary → pandas bytes objects →
struct.unpack), and the DuckDB oracle independently recomputes the
decoded fields arithmetically from ``documents`` — so the whole
binary round-trip (hex assembly → unhex → Arrow → Python bytes →
parse) is T2 value-checked, not just row-counted.

Scale notes: mapInPandas is the designated slow path (SURVEY.md §3.2
Python-worker boundary) — it exists here because byte-format parsing
genuinely cannot be expressed in Spark SQL built-ins. Batches arrive
sized by spark.sql.execution.arrow.maxRecordsPerBatch; the decode is
stateless per row, so the stage is embarrassingly parallel and the
only shuffle in either query is the final aggregate.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.multimodal import FPS, media_table

CAT = "multimodal"

_DECODE_SCHEMA = (
    "media_id bigint, kind string, payload_len bigint, width bigint, height bigint, "
    "n_frames bigint, digest_hex string"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Parse the synthetic payload format batch-by-batch (Arrow)."""
    for pdf in batches:
        out = {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "payload_len": pdf["payload"].map(len),
            "width": pd.array(
                [
                    struct.unpack(">I", p[0:4])[0] if k == "image" else None
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ],
                dtype="Int64",
            ),
            "height": pd.array(
                [
                    struct.unpack(">I", p[4:8])[0] if k == "image" else None
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ],
                dtype="Int64",
            ),
            "n_frames": pd.array(
                [
                    struct.unpack(">I", p[0:4])[0] if k == "video" else None
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ],
                dtype="Int64",
            ),
            "digest_hex": [
                p[8:24].hex() if k == "image" else None
                for p, k in zip(pdf["payload"], pdf["kind"])
            ],
        }
        yield pd.DataFrame(out)


@register(
    "q_multimodal_decode",
    oracle="""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 < 2 THEN 'image' ELSE 'video' END AS kind,
               CASE WHEN doc_id % 3 < 2 THEN 24
                    ELSE 8 + 4 * (4 + doc_id % 28) END AS payload_len,
               CASE WHEN doc_id % 3 < 2 THEN 64 + n_chars % 192 END AS width,
               CASE WHEN doc_id % 3 < 2 THEN 48 + doc_id % 144 END AS height,
               CASE WHEN doc_id % 3 = 2 THEN 4 + doc_id % 28 END AS n_frames,
               CASE WHEN doc_id % 3 < 2 THEN md5(text) END AS digest_hex
        FROM documents
    """,
    category=CAT,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode every media payload: byte-parse headers (width/height
    for images, frame count for videos) and the content digest, via
    mapInPandas over the binary column. The oracle recomputes each
    field arithmetically from documents — byte-level round-trip is
    therefore value-verified end-to-end."""
    media = media_table(spark, sf_dir)
    return (
        media.select("media_id", "kind", "payload")
        .mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
        .select(
            "media_id",
            "kind",
            "payload_len",
            "width",
            "height",
            "n_frames",
            "digest_hex",
        )
    )


SAMPLE_EVERY = 5


@register(
    "q_frame_sample",
    oracle=f"""
        WITH vids AS (
            SELECT doc_id AS media_id, 4 + doc_id % 28 AS n_frames
            FROM documents WHERE doc_id % 3 = 2
        )
        SELECT media_id,
               unnest(generate_series(0, n_frames - 1, {SAMPLE_EVERY})) AS frame_idx,
               unnest(generate_series(0, n_frames - 1, {SAMPLE_EVERY})) AS marker,
               {FPS} AS fps
        FROM vids
    """,
    category=CAT,
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: parse each video payload, emit every 5th frame
    with its 4-byte marker (which the synthetic format defines as the
    frame index — the oracle checks the parsed VALUE, proving the
    per-frame byte offsets are read correctly).

    Scale: one mapInPandas pass, output ~n_frames/5 rows per video;
    no shuffle at all — pure narrow pipeline.
    """

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, markers, fps = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n_frames, f = struct.unpack(">II", p[0:8])
                for i in range(0, n_frames, SAMPLE_EVERY):
                    marker = struct.unpack(">I", p[8 + 4 * i : 12 + 4 * i])[0]
                    ids.append(mid)
                    idxs.append(i)
                    markers.append(marker)
                    fps.append(f)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "marker": markers, "fps": fps}
            )

    media = media_table(spark, sf_dir).filter(F.col("kind") == "video")
    return media.select("media_id", "payload").mapInPandas(
        sample, schema="media_id bigint, frame_idx long, marker long, fps int"
    )


@register(
    "q_media_resize",
    oracle="""
        SELECT doc_id AS media_id,
               64 + n_chars % 192 AS width,
               48 + doc_id % 144 AS height,
               (64 + n_chars % 192) // 2 AS new_width,
               (48 + doc_id % 144) // 2 AS new_height,
               md5(text) AS digest_hex,
               24 AS payload_len
        FROM documents
        WHERE doc_id % 3 < 2
    """,
    category=CAT,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (half each dimension): read each image payload, rewrite
    the 8-byte header with the halved dimensions, keep the content
    digest, emit the RE-DECODED new payload — so the oracle checks
    that the byte-level rewrite round-trips (old dims parsed, new dims
    written at the right offsets, digest untouched, length preserved).

    A real deployment swaps the header arithmetic for an actual pixel
    resample (see sources/multimodal.py::decode_image_real for the
    codec stub policy); the Spark-side contract — binary in, binary
    out, one mapInPandas pass, schema stable — is what this operator
    pins down.

    Scale: stateless narrow pass; payload bytes never leave the
    executor except as the (smaller) resized column.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = {
                "media_id": [],
                "width": [],
                "height": [],
                "new_payload": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h = struct.unpack(">II", p[0:8])
                new_p = struct.pack(">II", w // 2, h // 2) + p[8:]
                out_rows["media_id"].append(mid)
                out_rows["width"].append(w)
                out_rows["height"].append(h)
                out_rows["new_payload"].append(new_p)
            yield pd.DataFrame(out_rows)

    media = media_table(spark, sf_dir).filter(F.col("kind") == "image")
    resized = media.select("media_id", "payload").mapInPandas(
        resize,
        schema="media_id bigint, width bigint, height bigint, new_payload binary",
    )
    # decode the RESIZED payload again — proves the rewrite landed at
    # the right byte offsets rather than trusting the writer
    return resized.select(
        "media_id",
        "width",
        "height",
        F.conv(F.hex(F.expr("substring(new_payload, 1, 4)")), 16, 10)
        .cast("long")
        .alias("new_width"),
        F.conv(F.hex(F.expr("substring(new_payload, 5, 4)")), 16, 10)
        .cast("long")
        .alias("new_height"),
        F.lower(F.hex(F.expr("substring(new_payload, 9, 16)"))).alias("digest_hex"),
        F.length("new_payload").cast("int").alias("payload_len"),
    )
