"""Multimodal query specs: binary-payload metadata (SQL-expressible twin)
and the Arrow-batched mapInPandas decode (rows-only check — genuinely
non-SQL-expressible Python stage; the driver records the weaker check)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from findb_spark.functions.hashing import hash48, hash48_duck, hexparse_duck
from findb_spark.ops.multimodal import attach_payload, decode_metadata, sample_frames
from findb_spark.registry import register
from findb_spark.session import load_table


@register(
    "multimodal_payload_stats",
    f"""
SELECT doc_id,
       octet_length(from_hex(md5(text))) AS n_bytes,
       16 + ({hash48_duck('text')} % 640) AS width,
       16 + (({hash48_duck('text')} // 640) % 480) AS height
FROM documents
""",
    category="multimodal",
    description="Binary payload metadata, JVM-side (payload bytes + hash-derived dimensions)",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = hash48(F.col("text"))
    return docs.select(
        "doc_id",
        F.octet_length(F.unhex(F.md5(F.col("text")))).alias("n_bytes"),
        (F.lit(16) + h % 640).alias("width"),
        (F.lit(16) + F.floor(h / 640).cast("bigint") % 480).alias("height"),
    )


@register(
    "multimodal_frame_sample",
    f"""
SELECT doc_id,
       CAST(2 * f AS INT) AS frame_index,
       {hexparse_duck('md5(text)', '16 * f + 1', 8)} AS frame_key
FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS f) t
""",
    category="multimodal",
    description="Row-expanding frame sampling (every 2nd 4-byte frame of the payload) through Arrow-batched mapInPandas; deterministic fake decode, real batch shape",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs), every_n=2)


@register(
    "multimodal_decode",
    f"""
SELECT doc_id,
       16 AS n_bytes,
       CAST(16 + ({hexparse_duck('md5(text)', 1, 4)} % 640) AS INT) AS width,
       CAST(16 + ({hexparse_duck('md5(text)', 5, 4)} % 480) AS INT) AS height,
       CAST(1 + ({hexparse_duck('md5(text)', 9, 2)} % 3) AS INT) AS channels,
       'fake' AS format
FROM documents
""",
    category="multimodal",
    description="Arrow-batched image-decode pipeline over binary payloads (deterministic fake decode, hex-parse oracle twin)",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_metadata(attach_payload(docs))


@register(
    "multimodal_ppm_decode",
    """
WITH d AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS w,
         CAST(6 + doc_id % 4 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id * 31 + r.r * 17 + c.c * 13 + ch.ch * 7) % 256 AS v
  FROM d, range(0, 9) r(r), range(0, 12) c(c), range(0, 3) ch(ch)
  WHERE r.r < d.h AND c.c < d.w
)
SELECT doc_id, CAST(MIN(w) AS INT) AS width, CAST(MIN(h) AS INT) AS height,
       3 AS channels, CAST(SUM(v) AS BIGINT) AS sum_pixels
FROM px GROUP BY doc_id
""",
    category="multimodal",
    description=(
        "REAL image decode: P6 PPM payloads (actual byte encoding) parsed "
        "and pixel-summed in Arrow batches; oracle recomputes the features "
        "from the closed-form pixel formula, so the check covers the whole "
        "encode -> bytes -> decode -> feature path with exact integers"
    ),
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_ppm_payload, decode_ppm_metadata

    docs = load_table(spark, sf_dir, "documents")
    return decode_ppm_metadata(attach_ppm_payload(docs))


@register(
    "multimodal_audio_features",
    """
WITH s AS (
  SELECT doc_id, i.i AS i,
         (doc_id * 7349 + i.i * 4799) % 65536 - 32768 AS v
  FROM documents, range(0, 256) i(i)
),
l AS (
  SELECT doc_id, i, v,
         LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
)
SELECT doc_id, 8000 AS sample_rate, 256 AS n_samples,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq,
       CAST(SUM(CASE WHEN pv IS NOT NULL AND ((v < 0) <> (pv < 0))
                     THEN 1 ELSE 0 END) AS INT) AS zero_crossings
FROM l GROUP BY doc_id
""",
    category="multimodal",
    description=(
        "REAL audio decode: RIFF/WAV PCM16 payloads parsed (header + "
        "int16 samples) with exact integer energy and zero-crossing "
        "features; formula-based oracle checks the full codec path"
    ),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_wav_payload, wav_features

    docs = load_table(spark, sf_dir, "documents")
    return wav_features(attach_wav_payload(docs))


@register(
    "multimodal_png_decode",
    """
WITH d AS (
  SELECT doc_id,
         CAST(16 + doc_id % 9 AS BIGINT) AS w,
         CAST(12 + doc_id % 7 AS BIGINT) AS h
  FROM documents
),
px AS (
  SELECT d.doc_id, d.w, d.h,
         (d.doc_id * 37 + r.r * 19 + c.c * 11 + ch.ch * 5) % 256 AS v
  FROM d, range(0, 18) r(r), range(0, 24) c(c), range(0, 3) ch(ch)
  WHERE r.r < d.h AND c.c < d.w
)
SELECT doc_id, CAST(MIN(w) AS INT) AS width, CAST(MIN(h) AS INT) AS height,
       CAST(SUM(v) AS BIGINT) AS sum_pixels,
       CAST(SUM(v * v) AS BIGINT) AS sum_sq
FROM px GROUP BY doc_id
""",
    category="multimodal",
    description=(
        "REAL compressed-image decode: RFC 2083 PNG payloads (chunked, "
        "CRC-32-verified, zlib-DEFLATE, scanline r filtered with type "
        "r % 5 so the decoder must implement all five filter specs) "
        "inflated and unfiltered in Arrow batches; PNG is lossless, so "
        "the oracle recomputes exact pixel sums from the closed-form "
        "formula — certifying the whole encode -> DEFLATE bytes -> "
        "decode -> feature path with exact integers"
    ),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_png_payload, decode_png_metadata

    docs = load_table(spark, sf_dir, "documents")
    return decode_png_metadata(attach_png_payload(docs))


@register(
    "multimodal_mulaw_roundtrip",
    """
WITH s AS (
  SELECT doc_id, i.i AS i,
         (doc_id * 7349 + i.i * 4799) % 65536 - 32768 AS x
  FROM documents, range(0, 256) i(i)
),
seg AS (
  SELECT doc_id, i, x, LEAST(ABS(x), 32635) + 132 AS v
  FROM s
),
exps AS (
  SELECT doc_id, x, v,
         CASE WHEN v < 256 THEN 0 WHEN v < 512 THEN 1 WHEN v < 1024 THEN 2
              WHEN v < 2048 THEN 3 WHEN v < 4096 THEN 4 WHEN v < 8192 THEN 5
              WHEN v < 16384 THEN 6 ELSE 7 END AS e
  FROM seg
),
dec AS (
  SELECT doc_id, x,
         (CASE WHEN x < 0 THEN -1 ELSE 1 END)
         * (132 * ((1 << e) - 1)
            + ((v // (1 << (e + 3))) % 16) * (1 << (e + 3))) AS y
  FROM exps
)
SELECT doc_id, 256 AS n_samples,
       CAST(SUM(y) AS BIGINT) AS sum_decoded,
       CAST(SUM(ABS(y - x)) AS BIGINT) AS sum_abs_err
FROM dec GROUP BY doc_id
""",
    category="multimodal",
    description=(
        "REAL lossy telephony codec roundtrip: ITU-T G.711 mu-law bytes "
        "(Sun/CCITT integer companding) decoded through the 256-entry "
        "inverse table, with exact integer reconstruction sum and total "
        "quantization error vs the source PCM; mu-law is memoryless, so "
        "the oracle expresses decode(encode(x)) in closed-form SQL — two "
        "genuinely independent implementations of the companding law"
    ),
)
def multimodal_mulaw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import (
        attach_mulaw_payload,
        mulaw_roundtrip_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return mulaw_roundtrip_features(attach_mulaw_payload(docs))


def _jpeg_oracle_sql() -> str:
    """Closed-form SQL twin of the JPEG pipeline: formula pixels ->
    integer fDCT -> quantize -> dequantize -> inverse integer DCT ->
    round/clamp — the exact math the numpy codec performs on either side
    of the real JFIF entropy layer. The DCT matrix and quant table are
    rendered from the SAME hardcoded constants the codec uses (one source
    of truth), and every division is sign-magnitude (non-negative
    operands), where DuckDB's truncating `//` and numpy's flooring `//`
    agree."""
    from findb_spark.functions.jpeg_codec import DCT_SCALE, M_INT, Q_LUM

    m_vals = ", ".join(
        f"({u}, {x}, {int(M_INT[u, x])})" for u in range(8) for x in range(8)
    )
    q_vals = ", ".join(
        f"({u}, {v}, {int(Q_LUM[u, v])})" for u in range(8) for v in range(8)
    )
    return f"""
WITH m(u, i, w) AS (VALUES {m_vals}),
q(u, v, qv) AS (VALUES {q_vals}),
d AS (SELECT doc_id, CAST(2 + doc_id % 2 AS BIGINT) AS wb FROM documents),
px AS (
  SELECT d.doc_id, d.wb, br.br, bc.bc, y.y, x.x,
         CAST(CASE d.doc_id % 3
              WHEN 0 THEN (d.doc_id * 41 + (br.br * 8 + y.y) * 23
                           + (bc.bc * 8 + x.x) * 29) % 256
              WHEN 1 THEN ((d.doc_id * 5 + (br.br * 8 + y.y)
                            + (bc.bc * 8 + x.x)) % 32) * 4 + 64
              ELSE ((br.br * 8 + y.y + bc.bc * 8 + x.x) % 2) * 16 + 120
                   + d.doc_id % 64
              END - 128 AS BIGINT) AS xv
  FROM d, range(0, 2) br(br), range(0, 3) bc(bc),
       range(0, 8) y(y), range(0, 8) x(x)
  WHERE bc.bc < d.wb
),
g AS (  -- first 1-D pass: g[u, x] = sum_y M[u, y] * X[y, x]
  SELECT px.doc_id, px.br, px.bc, m.u AS u, px.x AS x,
         SUM(CAST(m.w AS BIGINT) * px.xv) AS gv
  FROM px JOIN m ON m.i = px.y
  GROUP BY 1, 2, 3, 4, 5
),
f AS (  -- second 1-D pass: f[u, v] = sum_x M[v, x] * g[u, x]
  SELECT g.doc_id, g.br, g.bc, g.u, m.u AS v,
         SUM(CAST(m.w AS BIGINT) * g.gv) AS fv
  FROM g JOIN m ON m.i = g.x
  GROUP BY 1, 2, 3, 4, 5
),
c2 AS (  -- quantize (sign-magnitude round-half-away) then dequantize
  SELECT f.doc_id, f.br, f.bc, f.u, f.v,
         (CASE WHEN f.fv < 0 THEN -1 ELSE 1 END)
         * ((2 * ABS(f.fv) + {DCT_SCALE} * q.qv)
            // (2 * {DCT_SCALE} * q.qv)) * q.qv AS cv
  FROM f JOIN q ON q.u = f.u AND q.v = f.v
),
i1 AS (  -- inverse first pass: i1[y, v] = sum_u M[u, y] * C2[u, v]
  SELECT c2.doc_id, c2.br, c2.bc, m.i AS y, c2.v,
         SUM(CAST(m.w AS BIGINT) * c2.cv) AS iv
  FROM c2 JOIN m ON m.u = c2.u
  GROUP BY 1, 2, 3, 4, 5
),
x2 AS (  -- inverse second pass: x2[y, x] = sum_v M[v, x] * i1[y, v]
  SELECT i1.doc_id, i1.br, i1.bc, i1.y, m.i AS x,
         SUM(CAST(m.w AS BIGINT) * i1.iv) AS xv2
  FROM i1 JOIN m ON m.u = i1.v
  GROUP BY 1, 2, 3, 4, 5
),
rec AS (
  SELECT x2.doc_id, x2.br, x2.bc, x2.y, x2.x,
         LEAST(GREATEST((CASE WHEN x2.xv2 < 0 THEN -1 ELSE 1 END)
               * ((2 * ABS(x2.xv2) + {DCT_SCALE}) // (2 * {DCT_SCALE})),
               -128), 127) + 128 AS xhat
  FROM x2
)
SELECT px.doc_id,
       CAST(MIN(px.wb) * 8 AS INT) AS width,
       16 AS height,
       CAST(SUM(rec.xhat) AS BIGINT) AS sum_decoded,
       CAST(SUM(ABS(rec.xhat - (px.xv + 128))) AS BIGINT) AS sum_abs_err
FROM rec
JOIN px ON px.doc_id = rec.doc_id AND px.br = rec.br AND px.bc = rec.bc
       AND px.y = rec.y AND px.x = rec.x
GROUP BY px.doc_id
"""


@register(
    "multimodal_jpeg_roundtrip",
    _jpeg_oracle_sql(),
    category="multimodal",
    description=(
        "REAL baseline JPEG (ITU-T T.81 structure, grayscale): a real "
        "JFIF byte stream — SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers, "
        "canonical Huffman entropy coding declared in DHT, zigzag, "
        "differential DC prediction, 0xFF00 byte stuffing — over a fixed "
        "integer 8x8 DCT, so the whole lossy pipeline is exact integer "
        "math; the oracle reimplements fDCT->quant->dequant->iDCT in "
        "closed-form SQL from the same hardcoded constants, certifying "
        "the entropy layer bit-exactly (any Huffman/stuffing/zigzag/DC "
        "bug changes decoded levels and breaks parity), including the "
        "total reconstruction error of the lossy transform"
    ),
)
def multimodal_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import (
        attach_jpeg_payload,
        jpeg_roundtrip_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    return jpeg_roundtrip_features(attach_jpeg_payload(docs))


@register(
    "multimodal_image_ahash",
    """
WITH d AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS w,
         CAST(6 + doc_id % 4 AS BIGINT) AS h
  FROM documents
),
g AS (
  SELECT d.doc_id, r8.r8, c8.c8,
         (  ((d.doc_id * 31 + ((r8.r8 * d.h) // 8) * 17
              + ((c8.c8 * d.w) // 8) * 13 + 0) % 256)
          + ((d.doc_id * 31 + ((r8.r8 * d.h) // 8) * 17
              + ((c8.c8 * d.w) // 8) * 13 + 7) % 256)
          + ((d.doc_id * 31 + ((r8.r8 * d.h) // 8) * 17
              + ((c8.c8 * d.w) // 8) * 13 + 14) % 256)) // 3 AS gray
  FROM d, range(0, 8) r8(r8), range(0, 8) c8(c8)
),
m AS (SELECT doc_id, SUM(gray) // 64 AS mn FROM g GROUP BY doc_id),
b AS (
  SELECT g.doc_id, g.r8 * 8 + g.c8 AS i,
         CASE WHEN g.gray >= m.mn THEN 1 ELSE 0 END AS bit
  FROM g JOIN m ON g.doc_id = m.doc_id
),
hsh AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN i >= 32
                       THEN bit * (CAST(1 AS BIGINT) << CAST(i - 32 AS INT))
                       ELSE 0 END) AS BIGINT) AS ahash_hi,
         CAST(SUM(CASE WHEN i < 32
                       THEN bit * (CAST(1 AS BIGINT) << CAST(i AS INT))
                       ELSE 0 END) AS BIGINT) AS ahash_lo
  FROM b GROUP BY doc_id
),
dup AS (SELECT ahash_hi, ahash_lo, COUNT(*) AS n_same FROM hsh GROUP BY 1, 2)
SELECT h.doc_id, h.ahash_hi, h.ahash_lo, CAST(dup.n_same AS BIGINT) AS n_same_hash
FROM hsh h JOIN dup ON h.ahash_hi = dup.ahash_hi AND h.ahash_lo = dup.ahash_lo
""",
    category="multimodal",
    description=(
        "Perceptual average-hash over REAL decoded PPM images (the "
        "multimodal SimHash): integer grayscale -> nearest-neighbor 8x8 -> "
        "floor-mean threshold -> 64-bit hash as two 32-bit words, plus "
        "same-hash bucket sizes — perceptual dedup as a plain hash groupBy; "
        "oracle recomputes the hash from the closed-form pixel formula, "
        "certifying the whole encode -> bytes -> decode -> hash path"
    ),
)
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_ppm_payload, image_ahash

    docs = load_table(spark, sf_dir, "documents")
    hsh = image_ahash(attach_ppm_payload(docs))
    dup = hsh.groupBy("ahash_hi", "ahash_lo").agg(F.count("*").alias("n_same"))
    return hsh.join(dup, ["ahash_hi", "ahash_lo"]).select(
        "doc_id",
        "ahash_hi",
        "ahash_lo",
        F.col("n_same").cast("bigint").alias("n_same_hash"),
    )


@register(
    "multimodal_audio_frames",
    """
WITH s AS (
  SELECT doc_id, i.i AS i,
         (doc_id * 7349 + i.i * 4799) % 65536 - 32768 AS v
  FROM documents, range(0, 256) i(i)
),
f AS (
  SELECT doc_id, CAST(i // 64 AS INT) AS frame_idx,
         CAST(SUM(v * v) AS BIGINT) AS frame_energy
  FROM s GROUP BY 1, 2
),
pk AS (
  SELECT doc_id, MAX(frame_energy) AS peak FROM f GROUP BY doc_id
)
SELECT f.doc_id, f.frame_idx, f.frame_energy,
       CASE WHEN f.frame_energy = pk.peak THEN 1 ELSE 0 END AS is_peak_frame
FROM f JOIN pk ON f.doc_id = pk.doc_id
""",
    category="multimodal",
    description=(
        "Windowed audio features over REAL decoded WAV bytes: one row per "
        "64-sample frame with exact integer energy + peak-frame flag (the "
        "VAD/spectrogram frame shape); formula-based oracle certifies the "
        "full decode -> frame -> feature path"
    ),
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_wav_payload, wav_frame_energies

    docs = load_table(spark, sf_dir, "documents")
    f = wav_frame_energies(attach_wav_payload(docs))
    pk = f.groupBy("doc_id").agg(F.max("frame_energy").alias("peak"))
    return f.join(pk, "doc_id").select(
        "doc_id",
        "frame_idx",
        "frame_energy",
        F.when(F.col("frame_energy") == F.col("peak"), 1)
        .otherwise(0)
        .alias("is_peak_frame"),
    )


@register(
    "multimodal_image_resize",
    """
WITH d AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS w,
         CAST(6 + doc_id % 4 AS BIGINT) AS h
  FROM documents
)
SELECT d.doc_id, CAST(r.r AS INT) AS r, CAST(c.c AS INT) AS c,
       CAST((d.doc_id * 31 + ((r.r * d.h) // 4) * 17
             + ((c.c * d.w) // 4) * 13 + 0) % 256 AS INT) AS red,
       CAST((d.doc_id * 31 + ((r.r * d.h) // 4) * 17
             + ((c.c * d.w) // 4) * 13 + 7) % 256 AS INT) AS green,
       CAST((d.doc_id * 31 + ((r.r * d.h) // 4) * 17
             + ((c.c * d.w) // 4) * 13 + 14) % 256 AS INT) AS blue
FROM d, range(0, 4) r(r), range(0, 4) c(c)
""",
    category="multimodal",
    description=(
        "REAL image resize: P6 PPM payloads decoded and nearest-neighbor "
        "downsampled to 4x4 RGB thumbnails emitted long-format (one row "
        "per cell) — the decode->resize Arrow stage of a multimodal "
        "training pipeline; the oracle recomputes every cell from the "
        "closed-form pixel formula, certifying the encode -> bytes -> "
        "decode -> resize path end to end"
    ),
)
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_ppm_payload, image_resize_thumbs

    docs = load_table(spark, sf_dir, "documents")
    return image_resize_thumbs(attach_ppm_payload(docs))


@register(
    "multimodal_image_boxblur",
    """
WITH d AS (
  SELECT doc_id,
         CAST(8 + doc_id % 5 AS BIGINT) AS w,
         CAST(6 + doc_id % 4 AS BIGINT) AS h
  FROM documents
),
rc AS (SELECT doc_id, w, h, unnest(generate_series(1, h - 2)) AS r FROM d),
rcc AS (SELECT doc_id, w, r, unnest(generate_series(1, w - 2)) AS c FROM rc),
dd AS (SELECT doc_id, r, c, unnest([-1, 0, 1]) AS dr FROM rcc),
de AS (SELECT doc_id, r, c, dr, unnest([-1, 0, 1]) AS dc FROM dd)
SELECT doc_id, CAST(r AS INT) AS r, CAST(c AS INT) AS c,
       CAST(SUM((doc_id * 31 + (r + dr) * 17 + (c + dc) * 13 + 0) % 256) // 9
            AS INT) AS red,
       CAST(SUM((doc_id * 31 + (r + dr) * 17 + (c + dc) * 13 + 7) % 256) // 9
            AS INT) AS green,
       CAST(SUM((doc_id * 31 + (r + dr) * 17 + (c + dc) * 13 + 14) % 256) // 9
            AS INT) AS blue
FROM de GROUP BY doc_id, r, c
""",
    category="multimodal",
    description=(
        "REAL 3x3 box-blur convolution: P6 PPM payloads decoded and the "
        "9-neighborhood integer mean computed per interior cell (separable "
        "two-pass numpy stencil in one Arrow mapInPandas stage), emitted "
        "long-format; the oracle recomputes every blurred cell from the "
        "closed-form pixel formula — certifying the encode -> bytes -> "
        "decode -> convolve path end to end"
    ),
)
def multimodal_image_boxblur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from findb_spark.ops.multimodal import attach_ppm_payload, image_boxblur_cells

    docs = load_table(spark, sf_dir, "documents")
    return image_boxblur_cells(attach_ppm_payload(docs))
