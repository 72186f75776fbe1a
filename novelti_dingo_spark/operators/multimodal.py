"""Multimodal column handling (SURVEY.md §2.10 L6).

The testdata has no real image/audio blobs (SURVEY §1.2), so this module
synthesizes them: every document gets a REAL image payload — a complete,
spec-valid PNG (correct signature, IHDR/IDAT/IEND chunks, CRCs, zlib
scanlines; ``synth_png``) or a structurally valid JFIF/JPEG (SOI, APP0,
DQT, SOF0, DHT, SOS segment chain; ``synth_jpeg``) — and the decode
stage parses the HEADERS for real from the public file-format specs
(``parse_image_header``: PNG IHDR big-endian dims + color-type channel
map; JPEG marker-segment walk to the first SOF frame header). What stays
out of scope in this container is PIXEL decode (no image/audio codecs) —
entropy-decoding a JPEG scan is a codec's job; the returned width/
height/channels are true properties of real bytes, not fabrications.
Round-12 (replaces the round-11 ``decode_image_stub`` whose dimensions
were hash-derived fakes).

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

import pandas as pd
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
from ..sources.io import load_table, widen


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
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("format", StringType()),
        StructField("decoder", StringType()),
    ]
)

# PNG color type -> samples per pixel (PNG spec §11.2.2; palette images
# carry one index sample, the palette itself lives in PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# JPEG SOF markers (ITU T.81 §B.2.2): C0-C3, C5-C7, C9-CB, CD-CF — all
# frame headers share the (precision, height, width, ncomp) layout.
# C4=DHT, C8=JPG(reserved), CC=DAC are NOT frame headers.
_JPEG_SOF = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def synth_png(width: int, height: int, seed: int = 0) -> bytes:
    """A COMPLETE, spec-valid PNG from the public spec and stdlib zlib:
    signature, IHDR (big-endian dims, 8-bit RGB), one IDAT holding the
    zlib-compressed scanlines (filter byte 0 + deterministic pixel
    bytes from `seed`), IEND — every chunk with its correct CRC-32. Any
    real decoder accepts these bytes; dimensions parsed back from them
    are true properties of the file."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        for x in range(width * 3):
            raw.append((seed + 31 * y + x) & 0xFF)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def synth_jpeg(width: int, height: int) -> bytes:
    """A structurally valid baseline JFIF/JPEG segment chain from the
    public spec (ITU T.81 / JFIF 1.02): SOI, APP0-JFIF, DQT, SOF0
    carrying the real (height, width, 3 components), a minimal valid
    DHT, SOS, stuffing-free scan bytes, EOI. Marker structure and the
    SOF frame header are real and parseable; the entropy-coded scan is
    filler — decoding pixels needs a codec this container doesn't ship."""
    import struct

    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\x00" + bytes(range(1, 65))  # Pq/Tq=0 + 64-entry table
    sof0 = struct.pack(">BHHB", 8, height, width, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    # one DC table, a single 1-bit code for symbol 0
    dht = b"\x00" + bytes([1] + [0] * 15) + b"\x00"
    sos = b"\x03" + bytes([1, 0, 2, 0, 3, 0]) + b"\x00\x3f\x00"

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    return (
        b"\xff\xd8"
        + seg(0xE0, app0)
        + seg(0xDB, dqt)
        + seg(0xC0, sof0)
        + seg(0xC4, dht)
        + seg(0xDA, sos)
        + b"\x00\x01\x02\x03"
        + b"\xff\xd9"
    )


def parse_image_header(payload: bytes) -> tuple[str, int, int, int]:
    """REAL header decode from the public specs — (format, width,
    height, channels) read out of the actual bytes. PNG: verify the
    8-byte signature, require the first chunk to be IHDR, take the
    big-endian 4-byte dims and map the color type to channels. JPEG:
    verify SOI, walk the marker-segment chain (big-endian lengths;
    standalone RSTn/TEM markers have none) to the first SOF frame
    header and read its (height, width, ncomp). Raises ValueError on
    anything else — truncated files, bad signatures, a scan that ends
    before any frame header."""
    import struct

    if payload[:8] == _PNG_SIG:
        if len(payload) < 33 or payload[12:16] != b"IHDR":
            raise ValueError("PNG: truncated or first chunk not IHDR")
        width, height = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        if color_type not in _PNG_CHANNELS:
            raise ValueError(f"PNG: invalid color type {color_type}")
        return "png", width, height, _PNG_CHANNELS[color_type]
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                raise ValueError("JPEG: expected marker, got data byte")
            while i < len(payload) and payload[i] == 0xFF:
                i += 1  # fill bytes are legal
            if i >= len(payload):
                break
            marker = payload[i]
            i += 1
            if marker == 0xD9 or marker == 0xDA:
                break  # EOI / start-of-scan before any SOF
            if 0xD0 <= marker <= 0xD7 or marker == 0x01:
                continue  # standalone, no length
            if i + 2 > len(payload):
                raise ValueError("JPEG: truncated segment length")
            (seglen,) = struct.unpack(">H", payload[i:i + 2])
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", payload[i + 3:i + 7])
                ncomp = payload[i + 7]
                return "jpeg", w, h, ncomp
            i += seglen
        raise ValueError("JPEG: no SOF frame header before scan/EOI")
    raise ValueError("unknown image format (no PNG/JPEG signature)")


def synth_dims(doc_id: int) -> tuple[str, int, int]:
    """Deterministic per-document image spec: (format, width, height).
    Even doc_ids get PNGs, odd get JPEGs; dims in 4..63 so a synthesized
    corpus stays KB-scale per row while every file is real bytes."""
    return (
        "png" if doc_id % 2 == 0 else "jpeg",
        4 + (doc_id * 7) % 60,
        4 + (doc_id * 13) % 60,
    )


def _packed_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): every document carries a REAL image file as a
    BinaryType column — spec-valid PNG (full chunks + CRCs) or
    structurally valid JPEG, dims deterministic in doc_id (synth_dims).
    Synthesis is an Arrow-batched scalar UDF; at scale this column comes
    off disk instead, and everything downstream is identical."""
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def synth(ids: pd.Series) -> pd.Series:
        out = []
        for doc_id in ids:
            fmt, w, h = synth_dims(int(doc_id))
            out.append(
                synth_png(w, h, seed=int(doc_id) & 0xFF)
                if fmt == "png"
                else synth_jpeg(w, h)
            )
        return pd.Series(out)

    # widen: the per-row byte synthesis (and every downstream header
    # parse) otherwise serializes on the one-partition documents scan
    # (guide §2.5/§4); per-row outputs, order-insensitive downstream.
    # Only doc_id is needed — prune before the repartition ships rows.
    d = widen(load_table(spark, sf_dir, "documents").select("doc_id"))
    return d.select("doc_id", synth("doc_id").alias("payload"))


@register(
    "multimodal_decode_features",
    None,  # header parse is real but SQL has no PNG/JPEG reader →
    # rows-only; dims are pinned against the pure-python parser and the
    # synth spec in tests/test_text_multimodal.py.
    survey_rows="L6,X1",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: Arrow-batched image decode over binary payloads via
    mapInPandas — the real batch shape (Iterator[pd.DataFrame] →
    Iterator[pd.DataFrame]) a media feature-extractor uses. Round-12:
    width/height/channels/format are READ FROM THE BYTES by the
    public-spec header parser (parse_image_header), not fabricated —
    only pixel decode remains out of scope (no codecs in-container)."""
    import pandas as pd

    packed = _packed_images(spark, sf_dir)

    def extract(batches: Iterator) -> Iterator:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload_bytes": [len(p) for p in pdf["payload"]],
                    "width": [w for _, w, _, _ in parsed],
                    "height": [h for _, _, h, _ in parsed],
                    "channels": [c for _, _, _, c in parsed],
                    "format": [f for f, _, _, _ in parsed],
                    "decoder": "header-v1",
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


def plan_resize(payload: bytes, max_side: int) -> tuple[int, int, int]:
    """Resize PLAN from the real header: parse the true dimensions out
    of the bytes and compute the fit-to-max_side output geometry +
    RGB byte budget. The pixel resample itself needs a codec (out of
    scope in-container); everything a scheduler or cost model needs —
    true source dims, output dims, buffer size — is real."""
    _, w, h, _ = parse_image_header(payload)
    scale = min(1.0, max_side / max(w, h))
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    return ow, oh, ow * oh * 3


@register(
    "multimodal_resize",
    None,  # real header parse, pixel resample needs a codec →
    # rows-only; geometry pinned against the python planner in tests.
    survey_rows="L6,X1",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: batched resize planning over binary payloads (target 32px max
    side — half the synthesized corpus is larger and genuinely scales).
    Source dims come from the real header parse; JVM-side metadata
    filters would prune before this stage at scale."""
    import pandas as pd

    packed = _packed_images(spark, sf_dir)

    def resize_batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = [plan_resize(p, 32) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": [w for w, _, _ in out],
                    "out_height": [h for _, h, _ in out],
                    "resized_bytes": [b for _, _, b in out],
                    "decoder": "header-v1",
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
