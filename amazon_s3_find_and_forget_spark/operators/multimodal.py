"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched ``mapInPandas``
transforms, partition-friendly layout. Codec kernels are REAL for the
formats decodable with the standard library + numpy:

- WAV (RIFF/PCM) audio via ``wave``: true sample decode -> duration /
  rate / RMS / peak / zero-crossing / spectral-band features;
- PPM/PGM (netpbm), BMP, PNG (stdlib zlib), GIF (variable-width LZW),
  and baseline JPEG (pure-numpy Huffman+IDCT codec, ``jpeg.py``): true
  pixel decode -> dimension / channel-stat / histogram features, and a
  real nearest-neighbor resize that re-encodes the payload;
- MP4 (ISO-BMFF) and MP3 containers (``media_containers.py``): real
  box-tree / frame-header parses -> true durations, bitrate stats, and
  per-frame byte ranges (frame_sample hashes the actual frame bytes
  from the MP4 sample table).

Only the inner codecs that genuinely need external libraries (H.264/AAC
frame decode, MP3 audio synthesis, progressive JPEG) fall back to the
clearly-marked ``DETERMINISTIC_FAKE`` digest features so the distributed
path stays testable end-to-end; set it False to fail loudly instead.

Design: media rows are ``(media_id, kind, payload binary, meta struct)``.
Decode / resize / frame-sample are ``mapInPandas`` stages: one Arrow
batch in, one out, no driver involvement, scale = partition count. At
100 TB the payload column stays opaque to Catalyst (never shuffled unless
the transform needs it) and metadata predicates prune before decode.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import jpeg, media_containers
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("content_type", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha256", StringType(), True),
        StructField("payload_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)

# Set True to use the deterministic fake decoder (hash-seeded features)
# for formats WITHOUT an in-environment codec (MP3/MP4, and
# progressive/arithmetic JPEG); False raises NotImplementedError for
# those instead. WAV, PPM/PGM, uncompressed BMP, 8-bit PNG, GIF, and
# baseline JPEG payloads always take the real decode path (stdlib
# wave/zlib + numpy + the pure-numpy jpeg module — no external codec).
DETERMINISTIC_FAKE = True
FEATURE_DIM = 16


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB for externally-coded formats (Pillow/torchaudio/ffmpeg work).

    The deterministic fake derives a FEATURE_DIM float vector from the
    payload digest so tests exercise the full distributed pipeline with
    stable outputs.
    """
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError(
            f"{kind} decoding requires codec libraries not present here"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // len(digest) + 1))[: 4 * FEATURE_DIM], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


# --- real codecs (stdlib + numpy) -----------------------------------------


def _is_wav(payload: bytes) -> bool:
    return len(payload) > 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _is_pnm(payload: bytes) -> bool:
    return payload[:2] in (b"P5", b"P6")


def _decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/PCM WAV -> (mono float64 samples in [-1, 1], sample rate)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, sampwidth, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if sampwidth == 1:  # unsigned 8-bit
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    elif sampwidth == 2:  # signed 16-bit LE
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:  # signed 32-bit LE
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return samples, rate


def _audio_features(payload: bytes) -> np.ndarray:
    """Real audio features: duration/rate/energy stats + 10 log-power
    spectral bands (rFFT, geometrically-spaced edges)."""
    samples, rate = _decode_wav(payload)
    n = len(samples)
    duration_s = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    peak = float(np.max(np.abs(samples))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if n > 1 else 0.0
    bands = np.zeros(10)
    if n > 1:
        power = np.abs(np.fft.rfft(samples)) ** 2
        edges = np.unique(
            np.geomspace(1, len(power), num=11).astype(int)
        )
        for i in range(min(len(edges) - 1, 10)):
            seg = power[edges[i]: edges[i + 1]]
            bands[i] = np.log1p(seg.mean()) if len(seg) else 0.0
    out = np.array(
        [duration_s, rate / 48000.0, min(n, 2**31) / 1e6, rms, peak, zcr],
        dtype=np.float64,
    )
    return np.concatenate([out, bands]).astype(np.float32)[:FEATURE_DIM]


def _decode_pnm(payload: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB) -> uint8 array (h, w[, 3])."""
    # header: magic, width, height, maxval — whitespace separated with
    # optional '#' comments; pixel data follows the single whitespace
    # after maxval
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos: pos + 1].isspace():
            pos += 1
        if payload[pos: pos + 1] == b"#":
            while pos < len(payload) and payload[pos: pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos: pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if payload[:2] == b"P6" else 1
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * channels, offset=pos)
    return data.reshape((h, w, 3)) if channels == 3 else data.reshape((h, w))


def _is_bmp(payload: bytes) -> bool:
    return len(payload) > 54 and payload[:2] == b"BM"


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed BMP (24-bit BGR or 8-bit palette) -> uint8 (h, w, 3).

    The two layouts that cover essentially every uncompressed .bmp in
    the wild: BITMAPINFOHEADER, biCompression=0, rows padded to 4 bytes,
    bottom-up unless height is negative.
    """
    import struct

    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0:
        raise ValueError(f"compressed BMP (biCompression={comp}) unsupported")
    bottom_up, h = h > 0, abs(h)
    if bpp == 24:
        stride = (w * 3 + 3) & ~3
        rows = np.frombuffer(
            payload, np.uint8, stride * h, pix_off
        ).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR -> RGB
    elif bpp == 8:
        pal_off = 14 + hdr_size
        n_pal = (pix_off - pal_off) // 4
        pal = (
            np.frombuffer(payload, np.uint8, n_pal * 4, pal_off)
            .reshape(-1, 4)[:, :3][:, ::-1]  # BGRA -> RGB
        )
        stride = (w + 3) & ~3
        idx = np.frombuffer(
            payload, np.uint8, stride * h, pix_off
        ).reshape(h, stride)[:, :w]
        img = pal[idx]
    else:
        raise ValueError(f"{bpp}-bit BMP unsupported")
    return np.ascontiguousarray(img[::-1] if bottom_up else img)


def _encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) -> 24-bit uncompressed bottom-up BMP."""
    import struct

    rgb = arr if arr.ndim == 3 else np.stack([arr] * 3, axis=-1)
    h, w = rgb.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = rgb[..., ::-1].reshape(h, w * 3)  # RGB -> BGR
    pixels = rows[::-1].tobytes()
    file_hdr = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + pixels


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _is_png(payload: bytes) -> bool:
    return payload[:8] == _PNG_MAGIC


def _decode_png(payload: bytes) -> np.ndarray:
    """PNG -> uint8 array, stdlib zlib + numpy only.

    Supports the common shapes: 8-bit depth, gray (0), RGB (2),
    gray+alpha (4), RGBA (6), non-interlaced. All five scanline filters
    are implemented; Sub reduces to a per-channel modular cumsum
    (vectorized), Up is a vector add, Average/Paeth carry a left
    dependency and run per-pixel on their (rare) rows.
    """
    import struct
    import zlib

    pos, idat, meta = 8, [], None
    while pos < len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"PNG color type {color} unsupported")
            meta = (w, h, channels)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub: modular prefix sum per channel phase
            rec = line.reshape(-1, ch).cumsum(axis=0) % 256
            rec = rec.reshape(-1)
        elif ftype == 2:  # Up
            rec = (line + prev) % 256
        elif ftype in (3, 4):  # Average / Paeth: left-dependent
            rec = np.zeros(stride, dtype=np.int64)
            up = prev.astype(np.int64)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                if ftype == 3:
                    rec[i] = (line[i] + (left + up[i]) // 2) % 256
                else:
                    ul = up[i - ch] if i >= ch else 0
                    p = left + up[i] - ul
                    pa_, pb, pc = abs(p - left), abs(p - up[i]), abs(p - ul)
                    pred = (
                        left
                        if pa_ <= pb and pa_ <= pc
                        else (up[i] if pb <= pc else ul)
                    )
                    rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    img = out.reshape(h, w, ch)
    if ch == 1:
        return img[..., 0]
    if ch == 2:
        return img[..., 0]  # gray, alpha dropped
    return img[..., :3]  # RGB / RGBA -> RGB


def _encode_png(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) -> 8-bit PNG (filter 0, one IDAT)."""
    import struct
    import zlib

    rgb = arr if arr.ndim == 3 else arr[..., None]
    h, w, ch = rgb.shape
    color = {1: 0, 3: 2}[ch]
    scan = np.zeros((h, 1 + w * ch), dtype=np.uint8)
    scan[:, 1:] = rgb.reshape(h, w * ch)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes()))
        + chunk(b"IEND", b"")
    )


def _is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-variant LZW: variable-width codes, CLEAR/END, MSB-last bits."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None
    acc = bits = pos = 0
    while True:
        while bits < code_size:
            if pos >= len(data):
                return out
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        bits -= code_size
        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if code < len(dictionary) and (code < clear or dictionary[code]):
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None:
            dictionary.append(prev + entry[:1])
            if len(dictionary) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


def _decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a (first frame, global or local palette) -> uint8 RGB."""
    import struct

    sw, sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        palette = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _, _, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    payload, np.uint8, n * 3, pos
                ).reshape(-1, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos]:
                size = payload[pos]
                data += payload[pos + 1 : pos + 1 + size]
                pos += 1 + size
            pos += 1
            if palette is None:
                raise ValueError("GIF image without a palette")
            idx = np.array(
                _gif_lzw_decode(bytes(data), min_code)[: w * h], np.uint8
            ).reshape(h, w)
            return palette[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def _encode_gif(arr: np.ndarray) -> bytes:
    """uint8 (h, w[, 3]) with <=256 distinct colors -> GIF87a."""
    import struct

    rgb = arr if arr.ndim == 3 else np.stack([arr] * 3, axis=-1)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF encoding needs <=256 distinct colors")
    pal_bits = max((len(colors) - 1).bit_length(), 1)
    n_pal = 1 << pal_bits
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors

    min_code = max(pal_bits, 2)
    clear, end = 1 << min_code, (1 << min_code) + 1

    out_bits = bytearray()
    acc = bits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += size
        while bits >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    # greedy LZW with the standard width-growth schedule
    code_size = min_code + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(1 << min_code)}
    next_code = end + 1
    emit(clear, code_size)
    seq: tuple[int, ...] = ()
    for px in inverse.tolist():
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == (1 << 12):
            emit(clear, code_size)
            table = {(i,): i for i in range(1 << min_code)}
            next_code = end + 1
            code_size = min_code + 1
        seq = (px,)
    if seq:
        emit(table[seq], code_size)
    emit(end, code_size)
    if bits:
        out_bits.append(acc & 0xFF)

    body = bytearray()
    for i in range(0, len(out_bits), 255):
        chunk = out_bits[i : i + 255]
        body += bytes([len(chunk)]) + chunk
    body += b"\x00"

    return (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) & 7), 0, 0)
        + palette.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + bytes(body)
    )


def _decode_image(payload: bytes) -> np.ndarray:
    if _is_pnm(payload):
        return _decode_pnm(payload)
    if _is_bmp(payload):
        return _decode_bmp(payload)
    if _is_png(payload):
        return _decode_png(payload)
    if _is_gif(payload):
        return _decode_gif(payload)
    if jpeg.is_jpeg(payload):
        return jpeg.decode(payload)
    raise ValueError("not a supported raw image format")


def _encode_pnm(arr: np.ndarray) -> bytes:
    magic = b"P6" if arr.ndim == 3 else b"P5"
    h, w = arr.shape[:2]
    return magic + b"\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def _resize_nn(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample (pixel-center mapping)."""
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    return arr[rows][:, cols]


def _image_features(payload: bytes) -> np.ndarray:
    """Real image features: dims + per-channel mean/std + 8-bin gray
    histogram (density)."""
    arr = _decode_image(payload)
    rgb = arr if arr.ndim == 3 else np.stack([arr] * 3, axis=-1)
    x = rgb.astype(np.float64) / 255.0
    gray = x.mean(axis=-1)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    hist = hist / max(gray.size, 1)
    out = np.array(
        [
            arr.shape[1] / 4096.0,
            arr.shape[0] / 4096.0,
            *x.reshape(-1, 3).mean(axis=0),
            *x.reshape(-1, 3).std(axis=0),
        ],
        dtype=np.float64,
    )
    return np.concatenate([out, hist]).astype(np.float32)[:FEATURE_DIM]


def _mp3_features(payload: bytes) -> np.ndarray:
    """Real MP3 container features: duration, frame count, bitrate
    stats, sample rate — parsed from frame headers (no audio decode)."""
    frames = media_containers.parse_mp3(payload)
    if not frames:
        raise ValueError("no MP3 frames found")
    rates = np.array([f.bitrate_kbps for f in frames], dtype=np.float64)
    dur_s = sum(f.samples / f.sample_rate for f in frames)
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    out[0] = min(dur_s / 3600.0, 1.0)
    out[1] = min(len(frames) / 1e6, 1.0)
    out[2] = rates.mean() / 320.0
    out[3] = rates.std() / 320.0
    out[4] = frames[0].sample_rate / 48000.0
    out[5] = len(payload) / max(dur_s * 40_000.0, 1.0)  # bytes/s vs 320kbps
    return out.astype(np.float32)


def _mp4_features(payload: bytes) -> np.ndarray:
    """Real MP4 container features: duration, per-track sample counts
    and size stats — from the ISO-BMFF sample tables (no frame decode)."""
    info = media_containers.parse_mp4(payload)
    ranges = media_containers.mp4_frame_ranges(payload)
    sizes = np.array([s for _, s, _ in ranges], dtype=np.float64)
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    out[0] = min(info.duration_ms / 3.6e6, 1.0)
    out[1] = min(len(info.tracks) / 8.0, 1.0)
    out[2] = min(len(ranges) / 1e6, 1.0)
    if sizes.size:
        out[3] = min(sizes.mean() / 1e6, 1.0)
        out[4] = min(sizes.std() / 1e6, 1.0)
        fps = (
            len(ranges) / (info.duration_ms / 1000.0)
            if info.duration_ms
            else 0.0
        )
        out[5] = min(fps / 120.0, 1.0)
    return out.astype(np.float32)


def _decode_features(payload: bytes, kind: str) -> np.ndarray:
    if _is_wav(payload):
        return _audio_features(payload)
    if (
        _is_pnm(payload)
        or _is_bmp(payload)
        or _is_png(payload)
        or _is_gif(payload)
    ):
        return _image_features(payload)
    if jpeg.is_jpeg(payload):
        try:
            return _image_features(payload)
        except ValueError:
            # progressive/arithmetic JPEG — outside the baseline codec
            return _decode_stub(payload, kind)
    if media_containers.is_mp4(payload):
        try:
            return _mp4_features(payload)
        except ValueError:
            return _decode_stub(payload, kind)
    if media_containers.is_mp3(payload):
        try:
            return _mp3_features(payload)
        except ValueError:
            return _decode_stub(payload, kind)
    return _decode_stub(payload, kind)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over media rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                _decode_features(p if p is not None else b"", k).tolist()
                for p, k in zip(payloads, pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_sha256": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in payloads
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize: payload -> payload, metadata updated.

    PPM/PGM/BMP/PNG/GIF/baseline-JPEG payloads take the REAL kernel —
    decode, nearest-neighbor resample, re-encode — inside the Arrow
    batch loop (JPEG re-encodes at quality 90). Externally-coded
    formats (MP3/MP4 containers, progressive JPEG) fall back to the
    deterministic fake tag, or raise when ``DETERMINISTIC_FAKE`` is
    off. Either way the binary-in/binary-out shape is the same: the
    payload column round-trips through ``mapInPandas`` untouched by
    Catalyst, and the output schema carries the new dimensions.
    """

    def resize_one(p: bytes | None) -> bytes:
        p = p if p is not None else b""
        if _is_pnm(p):
            return _encode_pnm(_resize_nn(_decode_pnm(p), width, height))
        if _is_bmp(p):
            return _encode_bmp(_resize_nn(_decode_bmp(p), width, height))
        if _is_png(p):
            return _encode_png(_resize_nn(_decode_png(p), width, height))
        if _is_gif(p):
            # NN-resample only re-uses input pixels, so the palette bound
            # is preserved and the result re-encodes losslessly
            return _encode_gif(_resize_nn(_decode_gif(p), width, height))
        if jpeg.is_jpeg(p):
            try:
                resized = _resize_nn(jpeg.decode(p), width, height)
                # 4:2:0 for color (the dominant wild-JPEG layout, ~half
                # the bytes); grayscale encodes single-plane anyway
                sub = "420" if resized.ndim == 3 else "444"
                return jpeg.encode(resized, quality=90, subsampling=sub)
            except ValueError:
                if not DETERMINISTIC_FAKE:
                    raise
                return p + b"|resized:%dx%d" % (width, height)
        if not DETERMINISTIC_FAKE:
            raise NotImplementedError(
                "non-netpbm resize requires codec libraries not present here"
            )
        # deterministic fake for externally-coded formats
        return p + b"|resized:%dx%d" % (width, height)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [resize_one(p) for p in pdf["payload"]]
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    return df.where(F.col("kind") == "image").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Real MP4 payloads are read through the ISO-BMFF sample table
    (``media_containers.parse_mp4``): each emitted row is an ACTUAL
    frame — its byte range from stsz/stco, its timestamp from stts, and
    its digest over the frame's own bytes — downsampled to at most one
    frame per ``every_ms``. Non-MP4 payloads keep the metadata-driven
    fan-out with a payload-digest stand-in (decoding those needs codecs
    absent here). Either way the explode/fan-out shape — the part that
    matters for partitioning — is identical.
    """
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_ts_ms", LongType(), False),
            StructField("frame_sha256", StringType(), True),
        ]
    )

    def mp4_rows(media_id, payload):
        try:
            ranges = media_containers.mp4_frame_ranges(payload)
        except ValueError:
            return None  # corrupt container -> metadata-driven fallback
        rows = []
        next_ts = 0
        idx = 0
        for off, size, ts_ms in ranges:
            if ts_ms < next_ts:
                continue
            rows.append(
                (
                    media_id,
                    idx,
                    ts_ms,
                    hashlib.sha256(payload[off : off + size]).hexdigest(),
                )
            )
            idx += 1
            next_ts = ts_ms + every_ms
        return rows

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload_arr = pdf["payload"].to_numpy()
            id_arr = pdf["media_id"].to_numpy()
            real = np.array(
                [
                    p is not None and media_containers.is_mp4(p)
                    for p in payload_arr
                ],
                dtype=bool,
            )
            parts = []
            if real.any():
                rows = []
                for i in np.where(real)[0]:
                    r = mp4_rows(id_arr[i], payload_arr[i])
                    if r is None:
                        real[i] = False  # fall through to metadata path
                    else:
                        rows.extend(r)
                if rows:
                    parts.append(
                        pd.DataFrame(
                            rows,
                            columns=[
                                "media_id", "frame_idx", "frame_ts_ms",
                                "frame_sha256",
                            ],
                        )
                    )
            rest = pdf[~real]
            # vectorized fan-out: repeat each media row by its frame count
            durations = (
                rest["duration_ms"].fillna(0).astype(np.int64).to_numpy()
            )
            n_frames = np.maximum(durations // every_ms, 0)
            media_ids = np.repeat(rest["media_id"].to_numpy(), n_frames)
            frame_idx = (
                np.concatenate([np.arange(n, dtype=np.int64) for n in n_frames])
                if len(n_frames)
                else np.array([], dtype=np.int64)
            )
            payloads = np.repeat(rest["payload"].to_numpy(), n_frames)
            # the per-frame digest stands in for frame extraction (real
            # deployment: ffmpeg seek+decode here); hashing is the only
            # remaining per-row Python and it is C-level
            sha = [
                hashlib.sha256(
                    (p if p is not None else b"")
                    + int(i).to_bytes(4, "little")
                ).hexdigest()
                for p, i in zip(payloads, frame_idx)
            ]
            parts.append(
                pd.DataFrame(
                    {
                        "media_id": media_ids,
                        "frame_idx": frame_idx.astype(np.int64),
                        "frame_ts_ms": frame_idx * every_ms,
                        "frame_sha256": sha,
                    }
                )
            )
            out = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
            out["frame_idx"] = out["frame_idx"].astype(np.int32)
            out["frame_ts_ms"] = out["frame_ts_ms"].astype(np.int64)
            yield out

    return df.where(F.col("kind") == "video").mapInPandas(batches, schema=out_schema)
