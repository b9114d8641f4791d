"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas functions
(``mapInPandas``) — the pattern a 100 TB multimodal training-data pipeline
uses (decode/resize/feature-extract next to the data, never on the driver).

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernels are **deterministic stubs** clearly marked below: they
derive pseudo-features from the payload bytes. The Spark-side plumbing —
schema, binary handling, Arrow batch iteration, partition-parallel
execution — is real and tested; swapping ``_stub_decode_features`` for a
real codec is a one-function change.

Scale posture: mapInPandas streams Arrow batches per partition (payloads
never collect to the driver); metadata predicates (kind/width/...) are
plain columns, so Catalyst prunes/pushes them *before* the expensive
Python stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

MEDIA_SCHEMA = Ty.StructType(
    [
        Ty.StructField("media_id", Ty.LongType(), False),
        Ty.StructField("kind", Ty.StringType(), False),  # 'image'|'audio'|'video'
        Ty.StructField("payload", Ty.BinaryType(), True),
        Ty.StructField(
            "meta",
            Ty.StructType(
                [
                    Ty.StructField("width", Ty.IntegerType(), True),
                    Ty.StructField("height", Ty.IntegerType(), True),
                    Ty.StructField("sample_rate", Ty.IntegerType(), True),
                    Ty.StructField("n_frames", Ty.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, features array<float>"
THUMB_SCHEMA = "media_id long, kind string, thumb binary, thumb_w int, thumb_h int"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = repeated md5 bytes of the text (stands in for encoded pixels
    / samples); metadata derived from doc stats. Pure column ops.
    Spread first so the Arrow kernels downstream stream batches from all
    cores, not the single partition of a local one-file read."""
    from ..io import spread

    docs = spread(docs)
    return docs.selectExpr(
        "doc_id AS media_id",
        "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'"
        " ELSE 'video' END AS kind",
        "unhex(repeat(md5(text), 1 + CAST(n_chars % 7 AS INT))) AS payload",
        "named_struct("
        "'width', CAST(16 + doc_id % 64 AS INT),"
        "'height', CAST(16 + doc_id % 48 AS INT),"
        "'sample_rate', CAST(8000 + (doc_id % 4) * 8000 AS INT),"
        "'n_frames', CAST(1 + doc_id % 30 AS INT)) AS meta",
    )


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The kernel (and its decode stub) is a *nested* function so cloudpickle
    serializes it by value — Python workers need no importable
    etl_gamma_spark on their path.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def stub_decode(payload, n):
            # STUB — deterministic fake decode. A real pipeline would run
            # the codec here (PIL.Image.open / librosa.load / pyav) — not
            # available in this container.
            if payload is None:
                return [0.0] * n
            b = payload[:n] if len(payload) >= n else payload + b"\x00" * (n - len(payload))
            return [x / 255.0 for x in b]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int32"),
                    "features": pdf["payload"].map(
                        lambda p: stub_decode(p, n_features)
                    ),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_thumbnail(media: DataFrame, w: int = 4, h: int = 4) -> DataFrame:
    """'Resize' stub: truncate payload to w*h bytes (real impl: decode →
    resample → re-encode). Only images/videos produce thumbs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mask = pdf["kind"].isin(["image", "video"])
            out = pdf[mask]
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "kind": out["kind"],
                    "thumb": out["payload"].map(
                        lambda p: None if p is None else p[: w * h]
                    ),
                    "thumb_w": pd.Series([w] * len(out), index=out.index, dtype="int32"),
                    "thumb_h": pd.Series([h] * len(out), index=out.index, dtype="int32"),
                }
            )

    return media.mapInPandas(kernel, THUMB_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling stub for videos: emit one 16-byte 'frame' per
    ``every_n`` declared frames (1:N row explosion inside the batch —
    the shape a real frame sampler has)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame": []}
            vids = pdf[pdf["kind"] == "video"]
            for mid, payload, meta in zip(
                vids["media_id"], vids["payload"], vids["meta"]
            ):
                n_frames = int(meta["n_frames"]) if meta is not None else 0
                for idx in range(0, n_frames, every_n):
                    off = (idx * 16) % max(len(payload or b"\x00"), 1)
                    chunk = (payload or b"\x00")[off : off + 16]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(chunk)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, FRAME_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — stays fully JVM-side (no Python stage):
    proves predicates/aggregates on multimodal tables don't pay the
    decode cost."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
            F.max("meta.n_frames").alias("max_frames"),
        )
    )


# --- real binary codec: canonical PCM WAV headers -------------------------
#
# The decode stubs above stand in for heavy codecs (PIL/ffmpeg). This
# section is the opposite demonstration: a REAL binary format parsed
# entirely JVM-side with columnar expressions — no Python stage, no
# library. Canonical 44-byte PCM WAV headers (RIFF little-endian layout)
# are built and parsed via hex-string arithmetic; at 100 TB the parse
# touches only `substr(hex(payload), ...)` of the leading bytes, i.e. an
# object-store range read away from never fetching the sample data at
# all. Dialect-paired, so the whole codec is oracle-checkable.

WAV_SPARK = "spark"


def _shr(val: str, bits: int, d: str) -> str:
    return f"shiftright({val}, {bits})" if d == WAV_SPARK else f"({val} >> {bits})"


def le_hex_expr(val: str, n_bytes: int, d: str) -> str:
    """Little-endian hex encoding of a non-negative integer expression:
    low byte first, 2 uppercase hex digits per byte (both engines' hex()
    is uppercase/minimal, hence the lpad)."""
    pairs = [
        f"lpad(hex({_shr(f'({val})', 8 * k, d)} & 255), 2, '0')"
        for k in range(n_bytes)
    ]
    return f"concat({', '.join(pairs)})"


def le_int_expr(hex_col: str, byte_off: int, n_bytes: int, d: str) -> str:
    """Parse a little-endian unsigned int from a hex string at a 0-based
    BYTE offset (hex offsets are 1-based, 2 chars per byte)."""
    pairs = [
        f"substr({hex_col}, {2 * (byte_off + k) + 1}, 2)"
        for k in reversed(range(n_bytes))
    ]
    joined = f"concat({', '.join(pairs)})"
    if d == WAV_SPARK:
        return f"CAST(conv({joined}, 16, 10) AS BIGINT)"
    return f"CAST(('0x' || {joined}) AS BIGINT)"


def wav_hex_expr(
    channels: str, rate: str, bits: str, data_size: str, d: str
) -> str:
    """Hex of a canonical 44-byte PCM WAV header + ``data_size`` bytes of
    payload derived from md5 (deterministic stand-in samples). Field
    layout: RIFF <size> WAVE fmt <16> <pcm=1> <ch> <rate> <byte_rate>
    <block_align> <bits> data <data_size>."""
    byte_rate = f"(({rate}) * ({channels}) * ({bits}) DIV 8)"
    block_align = f"(({channels}) * ({bits}) DIV 8)"
    if d != WAV_SPARK:
        byte_rate = byte_rate.replace(" DIV ", " // ")
        block_align = block_align.replace(" DIV ", " // ")
    parts = [
        "'52494646'",  # 'RIFF'
        le_hex_expr(f"36 + ({data_size})", 4, d),
        "'57415645'",  # 'WAVE'
        "'666D7420'",  # 'fmt '
        le_hex_expr("16", 4, d),
        le_hex_expr("1", 2, d),  # PCM
        le_hex_expr(channels, 2, d),
        le_hex_expr(rate, 4, d),
        le_hex_expr(byte_rate, 4, d),
        le_hex_expr(block_align, 2, d),
        le_hex_expr(bits, 2, d),
        "'64617461'",  # 'data'
        le_hex_expr(data_size, 4, d),
        # sample bytes: md5 hex repeated to exactly data_size bytes
        f"upper(substr(repeat(md5(CAST({data_size} AS STRING)), "
        f"({data_size}) DIV 16 + 1), 1, 2 * ({data_size})))"
        if d == WAV_SPARK
        else f"upper(substr(repeat(md5(CAST({data_size} AS VARCHAR)), "
        f"({data_size}) // 16 + 1), 1, 2 * ({data_size})))",
    ]
    return f"concat({', '.join(parts)})"


WAV_PARSE_FIELDS = {
    # 0-based byte offsets in the canonical header
    "channels": (22, 2),
    "sample_rate": (24, 4),
    "bits_per_sample": (34, 2),
    "data_bytes": (40, 4),
}


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """Deterministic WAV corpus from the documents fixture: REAL binary
    payloads (unhex of the canonical header + sample bytes); channels /
    rate vary by doc_id so group-bys have structure."""
    from ..io import spread

    h = wav_hex_expr(
        "1 + doc_id % 2",
        "ELEMENT_AT(ARRAY(8000, 16000, 44100), CAST(doc_id % 3 AS INT) + 1)",
        "16",
        "n_chars",
        WAV_SPARK,
    )
    return spread(docs).selectExpr(
        "doc_id AS media_id", f"unhex({h}) AS payload"
    )


def wav_header_stats(media: DataFrame) -> DataFrame:
    """Per-(channels, sample_rate) corpus stats parsed ONLY from the
    binary headers: file count, total sample bytes, total duration in ms
    (exact integer arithmetic: bytes·8·1000 DIV (rate·ch·bits)). Invalid
    payloads (wrong RIFF/WAVE magic) are filtered out, not errors —
    corpus scans must survive junk rows."""
    hx = media.selectExpr(
        "media_id", "upper(hex(payload)) AS __h"
    )
    fields = {
        name: le_int_expr("__h", off, n, WAV_SPARK)
        for name, (off, n) in WAV_PARSE_FIELDS.items()
    }
    parsed = hx.selectExpr(
        "media_id",
        *[f"{e} AS {name}" for name, e in fields.items()],
        "substr(__h, 1, 8) = '52494646' AND substr(__h, 17, 8) = '57415645' AS __valid",
    )
    return (
        parsed.filter("__valid")
        .selectExpr(
            "channels",
            "sample_rate",
            "data_bytes",
            "(data_bytes * 8000) DIV (sample_rate * channels * bits_per_sample)"
            " AS duration_ms",
        )
        .groupBy("channels", "sample_rate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("data_bytes").cast("bigint").alias("total_bytes"),
            F.sum("duration_ms").cast("bigint").alias("total_duration_ms"),
        )
    )


# PNG IHDR — the image-side sibling of the WAV codec: big-endian, so the
# parse is a straight hex window (no byte swap). Layout: 8-byte magic
# 89504E470D0A1A0A, then the IHDR chunk (len=13, type 'IHDR', width @16,
# height @20, bit_depth @24, color_type @25 — 0-based byte offsets).

PNG_MAGIC_HEX = "89504E470D0A1A0A"


def be_int_expr(hex_col: str, byte_off: int, n_bytes: int, d: str) -> str:
    """Parse a big-endian unsigned int from a hex string at a 0-based
    byte offset — one contiguous hex window."""
    win = f"substr({hex_col}, {2 * byte_off + 1}, {2 * n_bytes})"
    if d == WAV_SPARK:
        return f"CAST(conv({win}, 16, 10) AS BIGINT)"
    return f"CAST(('0x' || {win}) AS BIGINT)"


def png_hex_expr(width: str, height: str, d: str) -> str:
    """Hex of a PNG signature + IHDR chunk (8-bit RGB, standard flags).
    The IHDR CRC is carried as a fixed placeholder — parsers here (and
    most corpus scanners) read geometry without CRC validation; the
    stdlib cross-check in tests validates the byte layout instead."""

    def be(val: str, n: int) -> str:
        return f"lpad(hex({val}), {2 * n}, '0')"

    return (
        f"concat('{PNG_MAGIC_HEX}', {be('13', 4)}, '49484452', "
        f"{be(width, 4)}, {be(height, 4)}, '08', '02', '000000', "
        f"'00000000')"
    )


def synth_png_media(docs: DataFrame) -> DataFrame:
    """Deterministic PNG-header corpus from the documents fixture:
    width/height derived from doc stats (header-only payloads — a
    geometry scan never needs pixel data)."""
    from ..io import spread

    h = png_hex_expr("CAST(64 + doc_id % 960 AS BIGINT)", "CAST(64 + n_chars % 960 AS BIGINT)", WAV_SPARK)
    return spread(docs).selectExpr(
        "doc_id AS media_id", f"unhex({h}) AS payload"
    )


def png_header_stats(media: DataFrame) -> DataFrame:
    """Aspect-bucketed geometry stats parsed from PNG headers only:
    (orientation, n_images, total_pixels, max_width, max_height).
    Non-PNG payloads are skipped, not fatal."""
    hx = media.selectExpr("media_id", "upper(hex(payload)) AS __h")
    parsed = hx.selectExpr(
        "media_id",
        f"{be_int_expr('__h', 16, 4, WAV_SPARK)} AS width",
        f"{be_int_expr('__h', 20, 4, WAV_SPARK)} AS height",
        f"substr(__h, 1, 16) = '{PNG_MAGIC_HEX}' AND substr(__h, 25, 8) = '49484452' AS __valid",
    )
    return (
        parsed.filter("__valid")
        .selectExpr(
            "CASE WHEN width > height THEN 'landscape' "
            "WHEN width < height THEN 'portrait' ELSE 'square' END AS orientation",
            "width",
            "height",
        )
        .groupBy("orientation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_images"),
            F.sum(F.expr("width * height")).cast("bigint").alias("total_pixels"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
        )
    )


# JPEG SOF — the third codec sibling, and the structurally hard one: the
# frame header (SOFn) sits at a VARIABLE offset behind a chain of
# variable-length segments (APP0, COM, ...), so the parse is a bounded
# MARKER WALK, not a fixed hex window. Each walk step is its own bound
# projection (offsets reused across steps stay single-evaluated — the
# same staged-column discipline as the BM25/PSI pipelines), and every
# step is plain hex/substr arithmetic available in both engines.

JPEG_SOI_HEX = "FFD8"
JPEG_SOF_MARKERS = ("FFC0", "FFC2")  # baseline + progressive
JPEG_WALK_STEPS = 4  # segments scanned before giving up (bounded walk)


def be16_at_expr(hex_col: str, off_expr: str, d: str) -> str:
    """Big-endian uint16 at a VARIABLE 0-based byte offset (column
    expression). try-cast semantics: an out-of-range window yields NULL,
    never an error — corpus scans must survive junk rows."""
    win = f"substr({hex_col}, 2 * ({off_expr}) + 1, 4)"
    if d == WAV_SPARK:
        return f"CAST(conv({win}, 16, 10) AS BIGINT)"
    return f"TRY_CAST(('0x' || {win}) AS BIGINT)"


def marker_at_expr(hex_col: str, off_expr: str) -> str:
    """The 2-byte marker at a variable offset, as 4 hex chars (dialect-
    identical)."""
    return f"substr({hex_col}, 2 * ({off_expr}) + 1, 4)"


def jpeg_hex_expr(height: str, width: str, com_pad: str, d: str) -> str:
    """Hex of a structurally valid JPEG header: SOI, a 16-byte APP0/JFIF
    segment, a COM segment of VARIABLE length (``com_pad`` payload bytes
    — this is what forces real marker walking), then SOF0 carrying the
    geometry. Segment lengths are honest (len field includes itself)."""

    def be(val: str, n: int) -> str:
        return f"lpad(hex({val}), {2 * n}, '0')"

    app0 = f"'FFE0', {be('16', 2)}, '4A46494600', repeat('00', 9)"
    com = f"'FFFE', {be(f'2 + ({com_pad})', 2)}, repeat('41', {com_pad})"
    sof0 = (
        f"'FFC0', {be('17', 2)}, '08', {be(height, 2)}, {be(width, 2)}, "
        f"'03', repeat('011100', 3)"
    )
    return f"concat('{JPEG_SOI_HEX}', {app0}, {com}, {sof0}, 'FFDA')"


def synth_jpeg_media(docs: DataFrame) -> DataFrame:
    """Deterministic JPEG-header corpus from the documents fixture; the
    COM padding varies per row so the SOF offset is data-dependent."""
    from ..io import spread

    h = jpeg_hex_expr(
        "CAST(120 + doc_id % 600 AS BIGINT)",
        "CAST(160 + n_chars % 800 AS BIGINT)",
        "CAST(4 + n_chars % 13 AS INT)",
        WAV_SPARK,
    )
    return spread(docs).selectExpr(
        "doc_id AS media_id", f"unhex({h}) AS payload"
    )


def jpeg_dims(media: DataFrame) -> DataFrame:
    """(media_id, width, height) parsed via the bounded marker walk.
    Rows whose SOI is missing or whose SOF is not found within
    JPEG_WALK_STEPS segments are dropped (junk tolerance)."""
    d = WAV_SPARK
    cur = media.selectExpr(
        "media_id", "upper(hex(payload)) AS __h", "CAST(2 AS BIGINT) AS __o0"
    )
    sofs = ", ".join(f"'{m}'" for m in JPEG_SOF_MARKERS)
    for i in range(JPEG_WALK_STEPS):
        cur = cur.selectExpr(
            "*",
            f"{marker_at_expr('__h', f'__o{i}')} AS __m{i}",
        ).selectExpr(
            "*",
            f"coalesce(__o{i} + 2 + {be16_at_expr('__h', f'__o{i} + 2', d)},"
            f" __o{i}) AS __o{i + 1}",
        )
    first_sof = "CASE " + " ".join(
        f"WHEN __m{i} IN ({sofs}) THEN __o{i}" for i in range(JPEG_WALK_STEPS)
    ) + " ELSE NULL END"
    return (
        cur.selectExpr(
            "media_id",
            "__h",
            f"substr(__h, 1, 4) = '{JPEG_SOI_HEX}' AS __soi",
            f"{first_sof} AS __sof",
        )
        .filter("__soi AND __sof IS NOT NULL")
        .selectExpr(
            "media_id",
            f"CAST({be16_at_expr('__h', '__sof + 7', d)} AS INT) AS width",
            f"CAST({be16_at_expr('__h', '__sof + 5', d)} AS INT) AS height",
        )
    )
