"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode kernels are REAL for every format a pure-stdlib parser can
handle:

  * BMP — header AND 24-bit pixel decode (``struct`` + numpy).
  * PNG — header AND full pixel decode for 8-bit RGB: chunk walk with
    CRC verification (``zlib.crc32``), IDAT inflate (``zlib``), and
    per-scanline unfilter of all five PNG filter types (None/Sub/Up/
    Average/Paeth, RFC 2083 §6). No PIL needed.
  * WAV — RIFF chunk walk + PCM16 sample decode.
  * video — YUV4MPEG2 (y4m): ASCII stream header + FRAME-marker walk +
    full per-frame plane decode. The uncompressed interchange container
    needs no codec library on either side.

``synthetic_media`` emits genuinely encoded BMP/PNG/WAV/y4m payloads
(including PNGs that cycle through all five filter types), so the
decoders are tested against real bytes; ``pattern="arith"`` makes the
pixel/sample values a closed-form function of (media_id, position) so
external oracles can recompute decoded statistics arithmetically.
``extract_features`` computes REAL features from the decoded bytes
(per-channel means + row moment for images; RMS / zero-crossing rate /
mean / peak for audio; frame statistics for video). The only remaining
library-bound formats are JPEG (HAVE_PIL gate) and compressed video
containers (mp4/webm — decode_error rows), with the Spark-side contract
— schema, Arrow batch shapes, ``mapInPandas`` plumbing, partitioning —
identical either way.

This is the sanctioned pandas/Arrow UDF slow path (BASELINE.json.input_hint
allows vectorized pandas UDFs; never per-row Python): binaries cross to
Python as Arrow batches, are processed batch-at-a-time, and return typed
columns. Decode failures surface per-row in a ``decode_error`` column
(quarantine-style) instead of failing the job — at 100 TB a corrupt blob
must not kill a stage.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

HAVE_PIL = False  # import-try gate for JPEG pixel decode (BMP/PNG need no PIL)
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    pass


# ---------------- pure-stdlib encoders (deterministic synthetic media) ----


def _det_bytes(seed: int, n: int) -> bytes:
    """n deterministic pseudo-random bytes (cheap multiplicative mix)."""
    x = (seed * 2654435761 + 1) & 0xFFFFFFFF
    out = bytearray(n)
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        out[i] = (x >> 16) & 0xFF
    return bytes(out)


def arith_px(seed: int, x: int, y: int, c: int) -> int:
    """Closed-form pixel value for ``pattern="arith"``: a function of
    (seed=media_id, x, y, semantic channel 0=R/1=G/2=B) an external SQL
    oracle can recompute — position-dependent, so row-order (BMP's
    bottom-up storage) and channel-order (BMP's BGR) decode mistakes
    change downstream statistics instead of canceling out."""
    return (seed + 3 * x + 7 * y + 11 * c) % 256


def bmp_bytes(width: int, height: int, seed: int = 0, pattern: str = "rand") -> bytes:
    """A real 24-bit uncompressed BMP (BITMAPINFOHEADER) with deterministic
    pixel data — decodable by any image library, parsed by _parse_image.
    Rows are stored bottom-up in B,G,R byte order per the format;
    ``pattern="arith"`` writes ``arith_px`` values (defined in top-down
    image space), ``"rand"`` writes _det_bytes noise."""
    row = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    if pattern == "arith":
        buf = bytearray(row * height)
        for j in range(height):  # file row j = image row height-1-j
            y = height - 1 - j
            base = j * row
            for x in range(width):
                o = base + x * 3
                buf[o] = arith_px(seed, x, y, 2)      # B
                buf[o + 1] = arith_px(seed, x, y, 1)  # G
                buf[o + 2] = arith_px(seed, x, y, 0)  # R
        data = bytes(buf)
    else:
        data = _det_bytes(seed, row * height)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + dib + data


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def png_bytes(width: int, height: int, seed: int = 0, pattern: str = "rand") -> bytes:
    """A real 8-bit RGB PNG (color type 2), pure stdlib: scanlines are
    filtered CYCLING THROUGH ALL FIVE filter types (``y % 5``) so a
    decoder must implement None/Sub/Up/Average/Paeth correctly, then
    zlib-compressed into one IDAT; every chunk carries its real CRC."""
    if pattern == "arith":
        rows = [
            bytes(
                arith_px(seed, x, y, c) for x in range(width) for c in range(3)
            )
            for y in range(height)
        ]
    else:
        flat = _det_bytes(seed, width * height * 3)
        rows = [flat[y * width * 3:(y + 1) * width * 3] for y in range(height)]
    bpp = 3
    filtered = bytearray()
    prior = bytes(width * bpp)
    for y, raw in enumerate(rows):
        ftype = y % 5
        filtered.append(ftype)
        out = bytearray(len(raw))
        for i in range(len(raw)):
            a = raw[i - bpp] if i >= bpp else 0  # predictors read RAW bytes
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                p = 0
            elif ftype == 1:
                p = a
            elif ftype == 2:
                p = b
            elif ftype == 3:
                p = (a + b) >> 1
            else:
                p = _paeth(a, b, c)
            out[i] = (raw[i] - p) & 0xFF
        filtered += out
        prior = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + _png_chunk(b"IEND", b"")
    )


def arith_sample(seed: int, i: int) -> int:
    """Closed-form PCM16 sample for ``pattern="arith"``: signed value in
    [-32768, 32767] as a function of (seed=media_id, flat sample index) —
    SQL-recomputable, sign-alternating (so zero-crossing rates are
    non-trivial)."""
    return ((seed * 31 + i * 17) % 65536) - 32768


def wav_bytes(
    sample_rate: int, n_samples: int, channels: int = 1, seed: int = 0,
    pattern: str = "rand",
) -> bytes:
    """A real PCM16 RIFF/WAVE file with deterministic sample data."""
    if pattern == "arith":
        data = np.array(
            [arith_sample(seed, i) for i in range(n_samples * channels)],
            dtype="<i2",
        ).tobytes()
    else:
        data = _det_bytes(seed, n_samples * channels * 2)
    block = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def arith_frame_px(seed: int, f: int, x: int, y: int, c: int) -> int:
    """Closed-form video sample for ``pattern="arith"``: plane c (0=Y,
    1=U, 2=V) of frame f — frame-dependent, so a decoder that mixed up
    frame boundaries would change per-frame statistics."""
    return (seed + 13 * f + 3 * x + 7 * y + 11 * c) % 256


def y4m_bytes(
    width: int, height: int, n_frames: int, fps: int = 4, seed: int = 0,
    pattern: str = "rand",
) -> bytes:
    """A REAL video container, pure stdlib: YUV4MPEG2 (y4m — the
    uncompressed interchange format ffmpeg/mjpegtools speak). ASCII
    stream header, then per-frame ``FRAME\\n`` markers each followed by
    three full-resolution planes (C444: Y, U, V raster order). The one
    video container that needs no codec library on either side."""
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode())
    for f_ in range(n_frames):
        out += b"FRAME\n"
        if pattern == "arith":
            out += bytes(
                arith_frame_px(seed, f_, x, y, c)
                for c in range(3) for y in range(height) for x in range(width)
            )
        else:
            out += _det_bytes(seed * 1000003 + f_, width * height * 3)
    return bytes(out)


# ---------------- pure-stdlib decoders (the decode kernels) --------------


def _y4m_frames(payload: bytes) -> "tuple[int, int, int, list[np.ndarray]]":
    """y4m stream -> (width, height, fps, [frame arrays (3, H, W) uint8]).
    Parses the ASCII stream header, then walks FRAME markers; raises on a
    malformed header, an unsupported colorspace, or truncated planes."""
    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "strict").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    cs = "C420jpeg"  # the format's default when no C tag is present
    for tok in head[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C"):
            cs = tok
    if w is None or h is None or fps is None:
        raise ValueError(f"incomplete y4m header {head!r}")
    if cs != "C444":
        raise ValueError(f"unsupported colorspace {cs} (decoder handles C444)")
    frame_bytes = w * h * 3
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        pos = fnl + 1
        plane = payload[pos:pos + frame_bytes]
        if len(plane) < frame_bytes:
            raise ValueError("truncated frame planes")
        frames.append(np.frombuffer(plane, np.uint8).reshape(3, h, w))
        pos += frame_bytes
    return w, h, fps, frames


def _bmp_pixels(payload: bytes) -> "np.ndarray | None":
    """24-bit BMP -> (H, W, 3) uint8 in SEMANTIC RGB, top-down image
    space (undoes the format's bottom-up row order and BGR byte order).
    None for non-24bpp; raises on truncated pixel data."""
    (off,) = struct.unpack_from("<I", payload, 10)
    w, h = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        return None
    topdown, h = h < 0, abs(h)
    row = (w * 3 + 3) & ~3
    if len(payload) < off + row * h:
        raise ValueError("truncated BMP pixel data")
    arr = (
        np.frombuffer(payload, dtype=np.uint8, count=row * h, offset=off)
        .reshape(h, row)[:, : w * 3]
        .reshape(h, w, 3)
    )
    if not topdown:
        arr = arr[::-1]
    return arr[..., ::-1]  # BGR -> RGB


def _png_pixels(payload: bytes) -> "tuple[np.ndarray | None, bool]":
    """PNG -> ((H, W, 3) uint8 RGB, crc_ok). Full decode: chunk walk with
    CRC verification, IDAT inflate (zlib IS stdlib), per-scanline
    unfilter of all five filter types. Pixel array is None (header-only)
    for color types other than 8-bit RGB; raises on structural damage."""
    pos, idat, crc_ok = 8, bytearray(), True
    w = h = depth = color = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if len(data) < ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) != crc:
            crc_ok = False
        if tag == b"IHDR":
            w, h = struct.unpack_from(">II", data, 0)
            depth, color = data[8], data[9]
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    if depth != 8 or color != 2:
        return None, crc_ok  # header-only for non-RGB8 (palette/alpha/gray)
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != (stride + 1) * h:
        raise ValueError(f"inflated size {len(raw)} != {(stride + 1) * h}")
    rows, prior, rpos = [], bytearray(stride), 0
    for _y in range(h):
        ftype, line = raw[rpos], raw[rpos + 1:rpos + 1 + stride]
        rpos += 1 + stride
        if ftype > 4:
            raise ValueError(f"bad PNG filter type {ftype}")
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prior[i]
            c = prior[i - 3] if i >= 3 else 0
            if ftype == 0:
                p = 0
            elif ftype == 1:
                p = a
            elif ftype == 2:
                p = b
            elif ftype == 3:
                p = (a + b) >> 1
            else:
                p = _paeth(a, b, c)
            cur[i] = (line[i] + p) & 0xFF
        rows.append(bytes(cur))
        prior = cur
    return np.frombuffer(b"".join(rows), np.uint8).reshape(h, w, 3), crc_ok


def _parse_image(payload: bytes | None) -> dict:
    """BMP / PNG decode -> format, width, height, bpp, plus PIXEL-derived
    ``px_mean`` (exact integer sum / count, so an arithmetic oracle can
    reproduce it bit-for-bit) and ``crc_ok`` (PNG chunk CRCs). Pure
    stdlib + numpy — no PIL. Unknown/truncated bytes -> decode_error,
    never an exception."""
    try:
        if payload is None or len(payload) < 26:
            return {"decode_error": "empty or truncated payload"}
        if payload[:2] == b"BM":
            w, h = struct.unpack_from("<ii", payload, 18)
            (bpp,) = struct.unpack_from("<H", payload, 28)
            if w <= 0 or abs(h) == 0:
                return {"decode_error": f"bad BMP dimensions {w}x{h}"}
            out = {"format": "bmp", "width": w, "height": abs(h), "bpp": bpp}
            px = _bmp_pixels(payload)
            if px is not None:
                out["px_mean"] = int(px.sum(dtype=np.int64)) / px.size
            return out
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            w, h = struct.unpack_from(">II", payload, 16)
            depth, color = payload[24], payload[25]
            ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color, 0)
            out = {"format": "png", "width": w, "height": h, "bpp": depth * ch}
            px, crc_ok = _png_pixels(payload)
            out["crc_ok"] = crc_ok
            if px is not None:
                out["px_mean"] = int(px.sum(dtype=np.int64)) / px.size
            return out
        return {"decode_error": f"unknown image magic {payload[:4]!r}"}
    except Exception as e:
        return {"decode_error": f"parse failure: {e}"}


def _parse_wav(payload: bytes | None) -> dict:
    """RIFF chunk walk -> channels, sample_rate, bits, duration_ms."""
    try:
        if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return {"decode_error": "not a RIFF/WAVE payload"}
        pos, fmt, data_size = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if cid == b"fmt " and size >= 16:
                fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size & 1)  # chunks pad to even offsets
        if fmt is None or data_size is None:
            return {"decode_error": "missing fmt or data chunk"}
        _, channels, rate, _, _, bits = fmt
        bytes_per_s = rate * channels * (bits // 8)
        if bytes_per_s <= 0:
            return {"decode_error": "zero-rate fmt chunk"}
        return {
            "channels": channels, "sample_rate": rate, "bits_per_sample": bits,
            "duration_ms": data_size * 1000 // bytes_per_s,
        }
    except Exception as e:  # pragma: no cover
        return {"decode_error": f"parse failure: {e}"}


# ---------------- the table + operators ----------------------------------


def synthetic_media(
    spark, n: int, kind: str = "image", pattern: str = "rand"
) -> DataFrame:
    """Deterministic media table, shape = MEDIA_SCHEMA. EVERY kind carries
    a REAL encoded payload built distributed inside mapInPandas — no
    driver-side loop: image = BMP24, png = RGB8 PNG, audio = PCM16 WAV,
    video = YUV4MPEG2 (y4m, 4 fps C444). meta matches the encoding.
    ``pattern="arith"`` makes pixel/sample values closed-form in
    (media_id, position) — see arith_px / arith_sample — so decoded
    statistics are recomputable by an external SQL oracle."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        (F.pmod(F.col("id"), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(48)) + 16).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(9000)) + 1000).alias("duration_ms"),
        F.lit(16000).alias("sample_rate"),
    )

    mime = {
        "image": "image/bmp", "png": "image/png",
        "audio": "audio/wav", "video": "video/x-yuv4mpeg",
    }[kind]
    fps = 4  # video frame rate: n_frames = duration_ms * fps // 1000

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            if kind == "image":
                pdf["payload"] = [
                    bmp_bytes(int(w), int(h), seed=int(i), pattern=pattern)
                    for i, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"])
                ]
            elif kind == "png":
                pdf["payload"] = [
                    png_bytes(int(w), int(h), seed=int(i), pattern=pattern)
                    for i, w, h in zip(pdf["media_id"], pdf["width"], pdf["height"])
                ]
            elif kind == "audio":
                pdf["payload"] = [
                    wav_bytes(int(sr), int(sr) * int(d) // 1000, seed=int(i),
                              pattern=pattern)
                    for i, d, sr in zip(
                        pdf["media_id"], pdf["duration_ms"], pdf["sample_rate"]
                    )
                ]
            else:  # video: REAL y4m streams (round 5 — no more fake bytes)
                pdf["payload"] = [
                    y4m_bytes(int(w), int(h), int(d) * fps // 1000, fps=fps,
                              seed=int(i), pattern=pattern)
                    for i, w, h, d in zip(
                        pdf["media_id"], pdf["width"], pdf["height"],
                        pdf["duration_ms"],
                    )
                ]
            yield pdf

    # payload generated IN the same stage as the dims (no join-back: a
    # generator utility must stay one narrow mapInPandas stage, not pay a
    # shuffle to reunite bytes with their own metadata)
    with_payload = base.mapInPandas(
        gen,
        "media_id long, width int, height int, duration_ms long, "
        "sample_rate int, payload binary",
    )
    out_kind = "image" if kind == "png" else kind
    return with_payload.select(
        "media_id",
        F.lit(out_kind).alias("kind"),
        "payload",
        F.struct(
            F.lit(mime).alias("mime"), "width", "height", "duration_ms", "sample_rate"
        ).alias("meta"),
    )


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in used ONLY for payloads no stdlib decoder
    exists for (video containers): sha-chain -> floats."""
    out = []
    h = payload or b""
    while len(out) < dim:
        h = hashlib.sha256(h).digest()
        out.extend(b / 255.0 for b in h[:8])
    return out[:dim]


def _wav_samples(payload: bytes) -> np.ndarray:
    """RIFF walk -> PCM16 samples as int64 (exact integer arithmetic)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE")
    pos, bits, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt " and size >= 16:
            bits = struct.unpack_from("<HHIIHH", payload, pos + 8)[5]
        elif cid == b"data":
            data = payload[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    if bits != 16 or data is None:
        raise ValueError(f"need PCM16 data chunk (bits={bits})")
    return np.frombuffer(data, dtype="<i2").astype(np.int64)


def image_feature_vec(payload: bytes) -> list[float] | None:
    """REAL image features from decoded pixels: [mean_R, mean_G, mean_B,
    y_moment]. Means are exact-integer-sum / count; y_moment =
    sum(value*row) / sum(value) over all channels — position-weighted, so
    a decoder that forgot BMP's bottom-up row order would NOT cancel out.
    All divisions are IEEE-exact over exact int64 sums, so an arithmetic
    oracle reproduces them bit-for-bit."""
    if payload[:2] == b"BM":
        px = _bmp_pixels(payload)
    elif payload[:8] == b"\x89PNG\r\n\x1a\n":
        px, _crc = _png_pixels(payload)
    else:
        return None
    if px is None:
        return None
    h, w, _ = px.shape
    p64 = px.astype(np.int64)
    means = [int(p64[:, :, c].sum()) / (w * h) for c in range(3)]
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    sv = int(p64.sum())
    y_moment = (int((p64 * ys).sum()) / sv) if sv else 0.0
    return means + [y_moment]


def audio_feature_vec(payload: bytes) -> list[float]:
    """REAL audio features from decoded PCM16 samples:
    [rms, zero_crossing_rate, mean, peak]. rms = sqrt(sum(s^2)/n); zcr =
    sign-changes/(n-1) with sign = (s >= 0); exact int64 sums under the
    IEEE ops, oracle-reproducible."""
    s = _wav_samples(payload)
    n = len(s)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    rms = float(np.sqrt(int((s * s).sum()) / n))
    zcr = (
        int(((s[:-1] >= 0) != (s[1:] >= 0)).sum()) / (n - 1) if n > 1 else 0.0
    )
    return [rms, zcr, int(s.sum()) / n, float(np.abs(s).max())]


def video_feature_vec(payload: bytes) -> list[float]:
    """REAL video features from decoded y4m frames: [n_frames,
    overall_mean, first_frame_y_mean, last_frame_y_mean] — frame-boundary
    sensitive (first/last Y means differ per frame under the arith
    pattern), exact-integer sums under IEEE divisions."""
    w, h, _fps, frames = _y4m_frames(payload)
    if not frames:
        return [0.0, 0.0, 0.0, 0.0]
    total = sum(int(fr.astype(np.int64).sum()) for fr in frames)
    return [
        float(len(frames)),
        total / (len(frames) * w * h * 3),
        int(frames[0][0].astype(np.int64).sum()) / (w * h),
        int(frames[-1][0].astype(np.int64).sum()) / (w * h),
    ]


def extract_features(df: DataFrame, dim: int = 4, batch_hint: int = 256) -> DataFrame:
    """Media feature extraction over mapInPandas — REAL kernels over the
    decoded bytes (round 5): BMP/PNG payloads get pixel statistics
    (per-channel means + row moment), WAV payloads get sample statistics
    (RMS, zero-crossing rate, mean, peak), y4m payloads get frame
    statistics (frame count, overall/first/last means). Video containers
    with no stdlib decoder (mp4/webm) fall back to the documented
    sha-chain stub; undecodable bytes yield null features
    (quarantine-style, the stage never fails). Output padded/truncated to
    ``dim``."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def one(payload: bytes | None, kind: str) -> list[float] | None:
        try:
            if payload is None:
                return None
            if payload[:2] == b"BM" or payload[:8] == b"\x89PNG\r\n\x1a\n":
                feats = image_feature_vec(payload)
            elif payload[:4] == b"RIFF":
                feats = audio_feature_vec(payload)
            elif payload[:9] == b"YUV4MPEG2":
                feats = video_feature_vec(payload)
            elif kind == "video":
                feats = _fake_feature(payload, dim)  # codec-bound containers
            else:
                return None
            if feats is None:
                return None
            return (feats + [0.0] * dim)[:dim]
        except Exception:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            kinds = pdf["kind"] if "kind" in pdf else ["" for _ in pdf["payload"]]
            pdf["features"] = [one(p, k) for p, k in zip(pdf["payload"], kinds)]
            yield pdf

    return df.mapInPandas(run, out_schema)


_IMAGE_DECODE_FIELDS = [
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("bpp", T.IntegerType()),
    T.StructField("px_mean", T.DoubleType()),   # pixel-decode mean (BMP24/RGB8 PNG)
    T.StructField("crc_ok", T.BooleanType()),   # PNG chunk CRCs all valid
    T.StructField("decode_error", T.StringType()),
]


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode over mapInPandas: appends format/width/height/bpp plus
    the PIXEL-decode columns ``px_mean`` (24-bit BMP and 8-bit RGB PNG —
    full inflate + unfilter, pure stdlib) and ``crc_ok`` (PNG chunk CRC
    verification). Rows the decoder can't handle get a ``decode_error``
    string and null stats instead of failing the stage. Only JPEG still
    requires PIL (HAVE_PIL gate); the plan and schema are identical when
    it lands."""
    out_schema = T.StructType(df.schema.fields + _IMAGE_DECODE_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            parsed = [_parse_image(p) for p in pdf["payload"]]
            for f in _IMAGE_DECODE_FIELDS:
                pdf[f.name] = [d.get(f.name) for d in parsed]
            yield pdf

    return df.mapInPandas(run, out_schema)


_AUDIO_DECODE_FIELDS = [
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("bits_per_sample", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("decode_error", T.StringType()),
]


def decode_audio(df: DataFrame) -> DataFrame:
    """RIFF/WAV decode over mapInPandas: channels, sample rate, bit depth
    and duration parsed from the payload bytes (pure stdlib). Same
    error-column contract as decode_image."""
    out_schema = T.StructType(df.schema.fields + _AUDIO_DECODE_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            parsed = [_parse_wav(p) for p in pdf["payload"]]
            for f in _AUDIO_DECODE_FIELDS:
                pdf[f.name] = [d.get(f.name) for d in parsed]
            yield pdf

    return df.mapInPandas(run, out_schema)


_VIDEO_DECODE_FIELDS = [
    T.StructField("format", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("fps", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("decode_error", T.StringType()),
]


def decode_video(df: DataFrame) -> DataFrame:
    """Video container decode over mapInPandas (y4m/YUV4MPEG2, pure
    stdlib): format, dimensions, frame rate, REAL frame count from
    walking the FRAME markers, and duration derived from them. Same
    error-column contract as the other decoders. Compressed containers
    (mp4/webm) genuinely need a codec library and surface as
    decode_error rows."""
    out_schema = T.StructType(df.schema.fields + _VIDEO_DECODE_FIELDS)

    def one(payload: bytes | None) -> dict:
        try:
            if payload is None or payload[:9] != b"YUV4MPEG2":
                return {"decode_error": "not a YUV4MPEG2 stream"}
            w, h, fps, frames = _y4m_frames(payload)
            return {
                "format": "y4m", "width": w, "height": h, "fps": fps,
                "n_frames": len(frames),
                "duration_ms": len(frames) * 1000 // fps,
            }
        except Exception as e:
            return {"decode_error": f"parse failure: {e}"}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            parsed = [one(p) for p in pdf["payload"]]
            for f in _VIDEO_DECODE_FIELDS:
                pdf[f.name] = [d.get(f.name) for d in parsed]
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """REAL frame extraction (round 5): decode every frame of each y4m
    payload and emit one row per frame with its timestamp and exact
    per-plane means — the Spark-side shape a frame-level feature pipeline
    consumes (one narrow mapInPandas, rows fan out inside the Arrow
    batch; undecodable payloads contribute zero rows, quarantine-style).
    Returns (id, frame_idx, ts_ms, y_mean, u_mean, v_mean)."""
    out_schema = (
        f"{id_col} long, frame_idx int, ts_ms long, "
        "y_mean double, u_mean double, v_mean double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                try:
                    w, h, fps, frames = _y4m_frames(payload)
                except Exception:
                    continue
                for i, fr in enumerate(frames):
                    f64 = fr.astype(np.int64)
                    rows.append({
                        id_col: int(mid), "frame_idx": i,
                        "ts_ms": i * 1000 // fps,
                        "y_mean": int(f64[0].sum()) / (w * h),
                        "u_mean": int(f64[1].sum()) / (w * h),
                        "v_mean": int(f64[2].sum()) / (w * h),
                    })
            yield pd.DataFrame(
                rows,
                columns=[id_col, "frame_idx", "ts_ms", "y_mean", "u_mean", "v_mean"],
            )

    return df.mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling *plan*: computes the frame timestamps to decode per
    row (expression-only) — the scheduling half used to prune which
    frames ``sample_frames`` should touch on containers where seeking is
    cheap. Returns one row per (media_id, frame_ts_ms)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
