"""Multimodal column handling (SURVEY.md §2.10 L6).

The testdata has no real image/audio blobs (SURVEY §1.2), so this module
establishes the *plumbing* a multimodal pipeline needs on Spark — typed
binary payloads + struct metadata, Arrow-batched decode UDFs — with the
actual media decode STUBBED deterministically (the container has no
image/audio libraries; see ``decode_image_stub``).

Pattern for 100 TB of media:
- payloads travel as ``BinaryType`` columns next to a ``StructType``
  metadata column (modality, byte length, content hash) — never as paths
  the executor re-fetches row-by-row;
- decode / resize / frame-sample run in ``mapInPandas`` so each Arrow
  batch crosses into Python once and the decoder amortizes setup;
- downstream filters (on metadata) stay JVM-side and prune before any
  batch reaches Python.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..registry import register
from ..sources.io import load_table


@register(
    "multimodal_pack",
    """
    SELECT doc_id,
           octet_length(text::BLOB)        AS payload_bytes,
           sha256(text)                    AS payload_sha256,
           'text/plain'                    AS media_type,
           lang                            AS meta_lang,
           n_chars                         AS meta_chars
    FROM documents WHERE doc_id < 100
    """,
    survey_rows="L6,F7",
)
def multimodal_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: pack rows into (binary payload, struct metadata) form and
    project typed fields back out — the schema contract for opaque media
    columns. Text stands in for media bytes; the shape is identical."""
    d = load_table(spark, sf_dir, "documents")
    packed = d.filter(F.col("doc_id") < 100).select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("media_type"),
            F.col("lang").alias("meta_lang"),
            F.col("n_chars").alias("meta_chars"),
        ).alias("meta"),
    )
    return packed.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("payload_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.meta_lang").alias("meta_lang"),
        F.col("meta.meta_chars").alias("meta_chars"),
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload_bytes", IntegerType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB for the real media decode. The container ships no image/audio
    codecs, so dimensions are derived deterministically from the payload;
    a production build replaces this body with e.g. PIL/libvips and keeps
    the exact same mapInPandas plumbing.
    """
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return 64 + h % 1024, 64 + (h // 1024) % 1024


@register(
    "multimodal_decode_features",
    None,  # decode is a stub (no codecs in-container) → rows-only; the
    # Arrow plumbing (schema, batching) is exercised for real.
    survey_rows="L6,X1",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: Arrow-batched 'decode' over binary payloads via mapInPandas —
    the real batch shape (Iterator[pd.DataFrame] → Iterator[pd.DataFrame])
    a media feature-extractor uses."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    packed = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def extract(batches: Iterator) -> Iterator:
        for pdf in batches:
            dims = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "fake_width": [w for w, _ in dims],
                    "fake_height": [h for _, h in dims],
                    "decoder": "stub-v1",
                }
            )

    return packed.mapInPandas(extract, _DECODE_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized_bytes", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def resize_stub(payload: bytes, max_side: int) -> tuple[int, int, int]:
    """STUB resize: scales the fake-decoded dimensions to fit max_side and
    reports a deterministic output byte count. Production: swap body for
    PIL/libvips thumbnail; plumbing (batch shape, schema) unchanged."""
    w, h = decode_image_stub(payload)
    scale = min(1.0, max_side / max(w, h))
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    return ow, oh, ow * oh * 3


@register(
    "multimodal_resize",
    None,  # stubbed codec → rows-only; determinism checked in tests.
    survey_rows="L6,X1",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: batched 'resize' over binary payloads (target 256px max side).
    JVM-side metadata filters would prune before this stage at scale."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    packed = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def resize_batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = [resize_stub(p, 256) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": [w for w, _, _ in out],
                    "out_height": [h for _, h, _ in out],
                    "resized_bytes": [b for _, _, b in out],
                    "decoder": "stub-v1",
                }
            )

    return packed.mapInPandas(resize_batches, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset_bytes", LongType()),
        StructField("frame_sha256_8", StringType()),
    ]
)


@register(
    "multimodal_frame_sample",
    None,  # stubbed codec → rows-only; row-explosion shape tested.
    survey_rows="L6,X4",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: frame sampling — one input 'video' row explodes into k frame
    rows (UDTF-shaped row→rows via mapInPandas). The stub samples 4
    evenly-spaced byte offsets as stand-in frames; a real build decodes
    keyframes at those timestamps with the same output schema."""
    import hashlib

    import pandas as pd

    K = 4
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    packed = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def sample(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_offset_bytes": [],
                    "frame_sha256_8": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k in range(K):
                    off = (n * k) // K
                    chunk = payload[off : off + 16]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame_offset_bytes"].append(off)
                    rows["frame_sha256_8"].append(
                        hashlib.sha256(chunk).hexdigest()[:8]
                    )
            yield pd.DataFrame(rows)

    return packed.mapInPandas(sample, _FRAME_SCHEMA)
