"""Multimodal column plumbing: opaque binary payloads with typed metadata,
processed by actor-pool map_batches stages.

Decoding is REAL for binary PPM (P6) images, PCM WAV audio, YUV4MPEG2
(Y4M) video, 8-bit gray/RGB PNG (zlib inflate + numpy unfiltering of
all five scanline filters), and baseline JPEG (the in-repo T.81
DCT+Huffman codec, ops/jpeg.py — the format real image corpora actually
contain).  The synthesized test corpus mixes PNG, PPM, and JPEG images,
so the decode stages exercise genuine byte-level parsing including
DEFLATE and entropy-coded DCT end-to-end.  The remaining compressed
codecs (MP3/H.264 via torchaudio / ffmpeg, progressive or subsampled
JPEG) are NOT available in this environment and stay honestly stubbed:
``decode_image``/``decode_audio``/``decode_video`` raise
NotImplementedError on unknown magic bytes, and stages constructed with
``fake_decoder=True`` keep the deterministic pseudo-decode for plumbing
tests that don't care about pixels.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),           # image | audio | video
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),        # opaque encoded bytes
    ]
)


def _seed_bytes(seed: bytes, n: int) -> np.ndarray:
    """Deterministically expand a digest to n uint8 values."""
    reps = n // len(seed) + 1
    return np.frombuffer(seed * reps, dtype=np.uint8)[:n]


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h, w, 3) uint8 array."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Parse a binary PPM (P6) payload to an (h, w, 3) uint8 array —
    real byte-level decoding, numpy only."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval, then exactly ONE whitespace
    # byte before the raster.  Parsed byte-by-byte (the header is ~20
    # bytes) rather than tokenized, for two spec behaviors a split would
    # break: '#' comments may appear between tokens, and raster bytes that
    # happen to be whitespace must not be stripped.
    ws = b"\t\n\x0b\x0c\r "
    pos, vals = 2, []
    while len(vals) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c in ws:
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM header")
            pos = nl + 1
        elif c.isdigit():
            end = pos
            while end < len(payload) and payload[end : end + 1].isdigit():
                end += 1
            vals.append(int(payload[pos:end]))
            pos = end
        else:
            raise ValueError("malformed PPM header")
    if pos >= len(payload) or payload[pos : pos + 1] not in ws:
        raise ValueError("truncated PPM header")
    pos += 1  # the single whitespace separating maxval from the raster
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = payload[pos:]
    need = w * h * 3
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster[:need], dtype=np.uint8).reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + 16-bit PCM mono data."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> np.ndarray:
    """Parse a 16-bit PCM mono RIFF/WAVE payload to an int16 sample array —
    real byte-level decoding, numpy only."""
    if not (payload.startswith(b"RIFF") and payload[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE payload")
    # walk chunks to the data chunk (fmt may be followed by extensions)
    pos = 12
    fmt_ok = False
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, _, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or channels != 1 or bits != 16:
                raise ValueError("only 16-bit PCM mono WAV is supported")
            fmt_ok = True
        elif cid == b"data":
            if not fmt_ok:
                raise ValueError("WAV data chunk before fmt chunk")
            return np.frombuffer(body[: size - size % 2], dtype="<i2")
        pos += 8 + size + (size % 2)
    raise ValueError("WAV payload has no data chunk")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Real PNG encoder (stdlib zlib + numpy): 8-bit RGB (color type 2),
    no interlace.  ``filter_type`` applies one of the five PNG scanline
    filters (0 none, 1 sub, 2 up, 3 average, 4 paeth) to every row —
    exposed so the decoder's unfiltering paths are all round-trip
    testable, not just the filter-0 one."""
    import zlib

    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png expects (h, w, 3) uint8")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"unknown PNG filter type {filter_type}")
    h, w = pixels.shape[:2]
    bpp = 3
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = pixels[y].reshape(-1)
        if filter_type == 0:
            filt = row
        else:
            left = np.zeros_like(row)
            left[bpp:] = row[:-bpp]
            up = prev
            ul = np.zeros_like(row)
            ul[bpp:] = prev[:-bpp]
            if filter_type == 1:
                filt = row - left
            elif filter_type == 2:
                filt = row - up
            elif filter_type == 3:
                filt = row - (
                    (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                ).astype(np.uint8)
            else:  # paeth
                filt = row - _paeth_predictor(left, up, ul)
        raw.append(filter_type)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth_predictor(
    left: np.ndarray, up: np.ndarray, ul: np.ndarray
) -> np.ndarray:
    a = left.astype(np.int32)
    b = up.astype(np.int32)
    c = ul.astype(np.int32)
    p = a + b - c
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Real PNG decoder (stdlib zlib inflate + numpy unfiltering) for the
    subset the encoder produces plus grayscale: 8-bit depth, color type 2
    (RGB, returns (h, w, 3)) or 0 (gray, returns (h, w, 1)), no
    interlace, chunk CRCs verified.  Filters 2 (up) unfilter vectorized;
    1/3/4 carry an intra-row left dependency and walk bytes per row —
    acceptable for the fixture-sized images this environment decodes
    (PIL/libpng stay the production path for arbitrary PNGs)."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    color_type = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2):
                raise ValueError(
                    "only 8-bit grayscale/RGB PNG is supported here"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/interlace")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("PNG payload missing IHDR/IDAT")
    bpp = 3 if color_type == 2 else 1
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ft == 0:
            pass
        elif ft == 2:
            row += prev
        elif ft in (1, 3, 4):
            ri = row.astype(np.int32)
            pi = prev.astype(np.int32)
            for i in range(stride):
                left = ri[i - bpp] if i >= bpp else 0
                if ft == 1:
                    ri[i] = (ri[i] + left) & 0xFF
                elif ft == 3:
                    ri[i] = (ri[i] + (left + pi[i]) // 2) & 0xFF
                else:
                    ul = pi[i - bpp] if i >= bpp else 0
                    p = left + pi[i] - ul
                    pa_, pb, pc = abs(p - left), abs(p - pi[i]), abs(p - ul)
                    if pa_ <= pb and pa_ <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = pi[i]
                    else:
                        pred = ul
                    ri[i] = (ri[i] + pred) & 0xFF
            row = ri.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = row
        prev = row
    return out.reshape(h, w, bpp)


def encode_y4m(frames: np.ndarray, rate: tuple[int, int] = (25, 1)) -> bytes:
    """YUV4MPEG2 (Y4M) bytes from an (n_frames, h, w) uint8 luma array,
    colorspace Cmono — the uncompressed video container mplayer/ffmpeg
    read; real enough that `ffplay out.y4m` would play it."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects (n_frames, h, w) uint8")
    _, h, w = frames.shape
    header = b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 Cmono\n" % (w, h, *rate)
    return header + b"".join(b"FRAME\n" + f.tobytes() for f in frames)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Parse a YUV4MPEG2 (Y4M) payload to an (n_frames, h, w) uint8 LUMA
    array — real byte-level parsing, numpy only.  Chroma planes (C420*/
    C422/C444) are skipped, not interpreted: downstream features use
    luma only.  The stream's own frame count is authoritative (metadata
    n_frames may drift from re-encoded media)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    width = height = None
    colorspace = "420jpeg"  # Y4M default when no C tag is present
    for token in payload[9:nl].split():
        tag, val = token[:1], token[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"C":
            colorspace = val.decode("ascii")
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    luma = width * height
    if colorspace == "mono":
        chroma = 0
    elif colorspace.startswith("420"):
        chroma = 2 * ((width // 2) * (height // 2))
    elif colorspace.startswith("422"):
        chroma = 2 * ((width // 2) * height)
    elif colorspace.startswith("444"):
        chroma = 2 * luma
    else:
        raise ValueError(f"unsupported Y4M colorspace C{colorspace}")

    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame marker")
        fnl = payload.find(b"\n", pos)  # FRAME line may carry parameters
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        start = fnl + 1
        if start + luma + chroma > len(payload):
            raise ValueError("truncated Y4M frame data")
        frames.append(
            np.frombuffer(payload[start : start + luma], dtype=np.uint8).reshape(
                height, width
            )
        )
        pos = start + luma + chroma
    return (
        np.stack(frames)
        if frames
        else np.empty((0, height, width), dtype=np.uint8)
    )


def decode_video(payload: bytes) -> np.ndarray:
    """(n_frames, h, w) uint8 luma frames.  REAL for YUV4MPEG2; compressed
    containers (MP4/H.264 via ffmpeg) are unavailable here and raise — the
    honest stub."""
    if payload.startswith(b"YUV4MPEG2"):
        return decode_y4m(payload)
    raise NotImplementedError(
        "only YUV4MPEG2 (Y4M) decodes in this environment; compressed "
        "video needs ffmpeg (not installed) — construct the stage with "
        "fake_decoder=True for the deterministic stand-in)"
    )


def synthesize_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic media rows derived from doc_id (test fixture
    generator).  Payloads are REAL encodings — P6 PPM and PNG (zlib
    DEFLATE, paeth-filtered) images, PCM WAV audio — whose pixel/sample
    bytes are a pure function of the id, so the decode stages run genuine
    parsers (including a compressed one) end-to-end.  PNG and PPM rows
    decode to identical pixels for the same id, so switching a row's
    container changes no downstream feature values."""
    ids = batch.column("doc_id").to_pylist()
    payloads, kinds, mimes, widths, heights = [], [], [], [], []
    for i in ids:
        seed = hashlib.sha256(f"media:{i}".encode()).digest()
        w = 16 + (i % 8) * 16
        h = 16 + (i % 5) * 16
        if i % 3 == 1:
            pixels = _seed_bytes(seed, w * h * 3).reshape(h, w, 3)
            payloads.append(encode_png(pixels, filter_type=4))
            kinds.append("image")
            mimes.append("image/png")
        elif i % 3 == 2:
            pixels = _seed_bytes(seed, w * h * 3).reshape(h, w, 3)
            payloads.append(encode_ppm(pixels))
            kinds.append("image")
            mimes.append("image/x-portable-pixmap")
        else:
            samples = (
                _seed_bytes(seed, 2048 * 2).view("<i2").astype(np.int16)
            )
            payloads.append(encode_wav(samples))
            kinds.append("audio")
            mimes.append("audio/wav")
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(kinds),
            "mime": pa.array(mimes),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


#: media_id offset for the JPEG flavor when both corpora ride ONE query
#: (far above any sf's doc ids and the 1e8 dedup planting offsets)
JPEG_MEDIA_OFFSET = 1_000_000_000


def synthesize_media_jpeg_batch(
    batch: pa.Table, id_offset: int = 0
) -> pa.Table:
    """Deterministic JPEG media rows derived from doc_id: 8x8
    BLOCK-CONSTANT grayscale images (block b's luma = digest byte
    b % 32) really encoded at quality 100 by the in-repo T.81 codec
    (ops/jpeg.py).  Block-constant pixels survive baseline JPEG
    BIT-EXACTLY at quality 100 (single integer DC coefficient,
    quantizer step 1 — see ops/jpeg.py), so the feature pipeline over
    these payloads is integer-exactly value-checkable from the seed
    (oracles.media_features_jpeg_sql), while the decode still runs the
    full real path: marker parse, DHT tables, Huffman, unstuffing,
    dequantize, IDCT."""
    from deduce_ray.ops.jpeg import encode_jpeg

    ids = batch.column("doc_id").to_pylist()
    payloads, widths, heights = [], [], []
    for i in ids:
        seed = hashlib.sha256(f"media:{i}".encode()).digest()
        w = 16 + (i % 8) * 16
        h = 16 + (i % 5) * 16
        nb = (h // 8) * (w // 8)
        block_vals = _seed_bytes(seed, nb).reshape(h // 8, w // 8)
        pixels = np.kron(block_vals, np.ones((8, 8), dtype=np.uint8))
        payloads.append(encode_jpeg(pixels, quality=100))
        widths.append(w)
        heights.append(h)
    n = len(ids)
    return pa.table(
        {
            "media_id": pa.array(
                [i + id_offset for i in ids], type=pa.int64()
            ),
            "kind": pa.array(["image"] * n),
            "mime": pa.array(["image/jpeg"] * n),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        },
        schema=MEDIA_SCHEMA,
    )


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode an image payload to a float32 grayscale (h, w) array in
    [0, 1].  REAL for binary PPM (P6), for 8-bit gray/RGB PNG (stdlib
    zlib inflate + numpy unfiltering), and for baseline JPEG (the
    in-repo T.81 Huffman+IDCT decoder, ops/jpeg.py — genuinely lossy
    DCT compression); progressive/subsampled JPEG raises — the honest
    stub."""
    if payload.startswith(b"P6"):
        rgb = decode_ppm(payload)
        return (rgb.astype(np.float32).mean(axis=2)) / 255.0
    if payload.startswith(_PNG_SIG):
        px = decode_png(payload)
        return (px.astype(np.float32).mean(axis=2)) / 255.0
    if payload.startswith(b"\xff\xd8"):
        from deduce_ray.ops.jpeg import decode_jpeg_rgb

        px = decode_jpeg_rgb(payload)
        return (px.astype(np.float32).mean(axis=2)) / 255.0
    raise NotImplementedError(
        "only binary PPM (P6), 8-bit gray/RGB PNG, and baseline JPEG "
        "decode in this environment (progressive/subsampled JPEG "
        "raises from the JPEG parser; construct the stage with "
        "fake_decoder=True for the deterministic stand-in)"
    )


def decode_image_rgbsum(payload: bytes) -> np.ndarray:
    """Decode an image payload to the flat per-pixel ``r+g+b`` INTEGER
    array (full scale 765) — the native-domain input of the
    integer-exact feature contract (see MediaFeatureExtractor).  Same
    codec policy as decode_image: PPM/PNG/baseline-JPEG real (gray
    JPEG v => r+g+b = 3v, like gray PNG); non-baseline JPEG raises."""
    if payload.startswith(b"P6"):
        rgb = decode_ppm(payload)
    elif payload.startswith(_PNG_SIG):
        rgb = decode_png(payload)
    elif payload.startswith(b"\xff\xd8"):
        from deduce_ray.ops.jpeg import decode_jpeg_rgb

        rgb = decode_jpeg_rgb(payload)
    else:
        raise NotImplementedError(
            "only binary PPM (P6), 8-bit gray/RGB PNG, and baseline "
            "JPEG decode in this environment (progressive/subsampled "
            "JPEG raises from the JPEG parser; construct the stage "
            "with fake_decoder=True for the deterministic stand-in)"
        )
    if rgb.shape[2] == 1:  # 8-bit gray PNG: gray v ≙ r=g=b=v → r+g+b = 3v
        return rgb.ravel().astype(np.int64) * 3
    return rgb.reshape(-1, rgb.shape[2]).astype(np.int64).sum(axis=1)


def decode_audio(payload: bytes) -> np.ndarray:
    """Decode an audio payload to float32 samples in [-1, 1].  REAL for
    16-bit PCM mono WAV; compressed codecs raise — the honest stub."""
    return decode_audio_ints(payload).astype(np.float32) / 32768.0


def decode_audio_ints(payload: bytes) -> np.ndarray:
    """int16 samples (full scale 32768) — the native-domain input of the
    integer-exact feature contract.  REAL for 16-bit PCM mono WAV;
    compressed codecs raise — the honest stub."""
    if payload.startswith(b"RIFF"):
        return decode_wav(payload)
    raise NotImplementedError(
        "only PCM WAV decodes in this environment; compressed audio "
        "codecs need torchaudio/ffmpeg (construct the stage with "
        "fake_decoder=True for the deterministic stand-in)"
    )


def _grid_means(plane: np.ndarray, g: int) -> np.ndarray:
    """(g*g,) block means of a 2-D uint8 plane, normalized to [0, 1] —
    the fixed-dim per-frame feature.  reduceat sums over the g uneven
    blocks each axis, divided by exact block areas.  Frames smaller than
    the grid take the clamped-range path (each block covers >= 1 pixel,
    overlapping when necessary) — the reduceat boundaries would collapse
    to zero-area blocks and emit inf."""
    h, w = plane.shape
    if h >= g and w >= g:
        ys = (np.arange(g) * h) // g
        xs = (np.arange(g) * w) // g
        sums = np.add.reduceat(
            np.add.reduceat(plane.astype(np.float64), ys, axis=0), xs, axis=1
        )
        areas = np.outer(
            np.diff(np.append(ys, h)), np.diff(np.append(xs, w))
        )
        return (sums / areas / 255.0).ravel()
    out = np.empty(g * g, dtype=np.float64)
    for i in range(g):
        y0 = (i * h) // g
        y1 = max(((i + 1) * h) // g, y0 + 1)
        for j in range(g):
            x0 = (j * w) // g
            x1 = max(((j + 1) * w) // g, x0 + 1)
            out[i * g + j] = plane[y0:y1, x0:x1].mean()
    return out / 255.0


def _fake_bytes(payload: bytes, n: int) -> np.ndarray:
    """The fake-decoder byte contract, defined once: the payload's
    sha256 digest tiled to n uint8 values (shared by the float stand-in
    and the integer-exact feature path)."""
    return _seed_bytes(hashlib.sha256(payload).digest(), n)


def _fake_decode(payload: bytes, n: int) -> np.ndarray:
    return _fake_bytes(payload, n).astype(np.float32) / 255.0


class MediaFeatureExtractor:
    """Actor-pool stage: decode payloads and emit fixed-dim features.

    Use small ``batch_size`` for large payloads (a batch x concurrency must
    fit the worker heap); model/codec setup belongs here in ``__init__``,
    once per actor.

    Feature contract (integer-exact, so an independent implementation —
    including the DuckDB SQL oracle, see
    ``deduce_ray.oracles.media_features_sql`` — reproduces every value
    bit for bit): the decoded signal is kept in its native INTEGER
    domain (image pixel j contributes ``r+g+b`` with full-scale 765,
    audio keeps int16 samples with full-scale 32768, video/fake keep
    raw bytes with full-scale 255), truncated to a multiple of
    ``FEATURE_DIM`` and mean-pooled per bin as

        feature[t] = floor(1e6 * sum_t / (full_scale * q)) / 1e6

    with ``q = n // FEATURE_DIM`` — i.e. the normalized mean intensity
    of the bin, floor-quantized to micro-units.  Integer sums and a
    single exact floor division make the value a deterministic rational
    rather than an accumulation-order-dependent float.

    ``exploded=True`` emits one row per (media_id, dim) with the value
    as float64 — the registry/oracle shape; the default emits the
    compact ``list<float32>`` feature column.
    """

    FEATURE_DIM = 32

    def __init__(self, fake_decoder: bool = False, exploded: bool = False) -> None:
        self.fake_decoder = fake_decoder
        self.exploded = exploded

    def _decode_ints(
        self, payload: bytes, kind: str, width: int, height: int
    ) -> tuple[np.ndarray, int]:
        """(integer signal, full-scale denominator) for the pooling
        contract; decoding itself is byte-real (see decode_image /
        decode_audio / decode_video for the honest-stub policy)."""
        if self.fake_decoder:
            return _fake_bytes(payload, 64 * 64).astype(np.int64), 255
        if kind == "audio":
            return decode_audio_ints(payload).astype(np.int64), 32768
        if kind == "video":
            return decode_video(payload).ravel().astype(np.int64), 255
        return decode_image_rgbsum(payload), 765

    def _pool_micro(self, ints: np.ndarray, denom: int) -> np.ndarray:
        dim = self.FEATURE_DIM
        if len(ints) < dim:
            # tiny-but-valid media (e.g. a 2x2 image, a <32-sample
            # clip): zero-pad so the fixed-dim pooling never reshapes
            # an empty array
            ints = np.pad(ints, (0, dim - len(ints)))
        q = len(ints) // dim
        sums = ints[: q * dim].reshape(dim, q).sum(axis=1, dtype=np.int64)
        # exact rational floor in int64 (numpy // floors like Python)
        return (sums * 1_000_000) // (denom * q)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()

        micros = [
            self._pool_micro(*self._decode_ints(payload, kind, w, h))
            for payload, kind, w, h in zip(payloads, kinds, widths, heights)
        ]

        if self.exploded:
            dim = self.FEATURE_DIM
            n = len(ids)
            return pa.table(
                {
                    "media_id": pa.array(
                        np.repeat(np.asarray(ids, dtype=np.int64), dim)
                    ),
                    # dtype=object pins the string type on EMPTY batches
                    # (np.asarray([]) would default to float64 and break
                    # cross-block schema unification)
                    "kind": pa.array(
                        np.repeat(np.asarray(kinds, dtype=object), dim),
                        type=pa.string(),
                    ),
                    "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), n)),
                    "value": pa.array(
                        (np.concatenate(micros) if micros else
                         np.empty(0, dtype=np.int64)).astype(np.float64) / 1e6
                    ),
                }
            )

        features = [(m.astype(np.float64) / 1e6).astype(np.float32) for m in micros]
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "feature": pa.array(
                    [f.tolist() for f in features], type=pa.list_(pa.float32())
                ),
            }
        )


def _media_pool(concurrency):
    """Actor-pool size for the media stages: ``None`` scales the pool
    ceiling to the cluster's CPUs (the old fixed (1, 4) ceiling left
    28 of 32 cores idle on a 500k-doc decode leg at the sf10 stress —
    codec decode is pure CPU and embarrassingly parallel)."""
    if concurrency is not None:
        return concurrency
    import ray

    cpus = (
        int(ray.cluster_resources().get("CPU", 4))
        if ray.is_initialized()
        else 4
    )
    return (1, max(4, cpus))


def extract_media_features(ds, fake_decoder: bool = False, concurrency=None,
                           batch_size: int = 16, exploded: bool = False):
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_media_pool(concurrency),
        fn_constructor_kwargs={
            "fake_decoder": fake_decoder,
            "exploded": exploded,
        },
    )


class ImageResizer:
    """Actor-pool stage: decode image payloads and emit a fixed (target x
    target) nearest-neighbour downsample as a flat float32 vector.

    Same contract as MediaFeatureExtractor: codec setup belongs in
    ``__init__`` (once per actor); the real decoder is stubbed in this
    environment (``fake_decoder=True`` produces the deterministic
    stand-in), while the resampling math, schema, and batch plumbing are
    real.  Non-image rows pass through with a null pixel column.
    """

    def __init__(self, target: int = 8, fake_decoder: bool = False) -> None:
        self.target = target
        self.fake_decoder = fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()

        pixels_out: list[list[float] | None] = []
        for kind, payload, w, h in zip(kinds, payloads, widths, heights):
            if kind != "image":
                pixels_out.append(None)
                continue
            if self.fake_decoder:
                img = _fake_decode(payload, w * h).reshape(h, w)
            else:
                img = decode_image(payload, w, h)
            # index by the DECODED shape: the payload is authoritative
            # (metadata width/height may drift from re-encoded media)
            dh, dw = img.shape
            ys = (np.arange(self.target) * dh) // self.target
            xs = (np.arange(self.target) * dw) // self.target
            small = img[np.ix_(ys, xs)]
            pixels_out.append([round(float(x), 6) for x in small.ravel()])

        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "kind": pa.array(kinds),
                "pixels": pa.array(pixels_out, type=pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool flat-map stage: decode video payloads and emit one row
    per SAMPLED frame (every ``stride``-th of ``n_frames``), each with a
    small per-frame feature vector — the shape a video-pretraining
    pipeline needs (batch in: one row per video; batch out: multiple rows
    per video, schema change included)."""

    FRAME_DIM = 16

    def __init__(self, stride: int = 4, fake_decoder: bool = False) -> None:
        self.stride = stride
        self.fake_decoder = fake_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_frames_col = (
            batch.column("n_frames").to_pylist()
            if "n_frames" in batch.schema.names
            else [0] * len(ids)
        )

        out_ids, out_idx, out_feats = [], [], []
        for mid, kind, payload, n_frames in zip(ids, kinds, payloads, n_frames_col):
            if kind != "video":
                continue
            if self.fake_decoder:
                if not n_frames:
                    continue
                frames = _fake_decode(payload, n_frames * self.FRAME_DIM).reshape(
                    n_frames, self.FRAME_DIM
                )
            else:
                # real Y4M decode; the stream's frame count is
                # authoritative, and the per-frame feature is a 4x4 grid
                # of luma block means in [0, 1] — computed ONLY for the
                # sampled frames (stride-skipped frames cost nothing)
                luma = decode_video(payload)
                n_frames = luma.shape[0]
                for f in range(0, n_frames, self.stride):
                    out_ids.append(mid)
                    out_idx.append(f)
                    out_feats.append(
                        [round(float(x), 6) for x in _grid_means(luma[f], 4)]
                    )
                continue
            for f in range(0, n_frames, self.stride):
                out_ids.append(mid)
                out_idx.append(f)
                out_feats.append([round(float(x), 6) for x in frames[f]])

        return pa.table(
            {
                "media_id": pa.array(out_ids, type=pa.int64()),
                "frame_idx": pa.array(out_idx, type=pa.int32()),
                "frame_feature": pa.array(out_feats, type=pa.list_(pa.float32())),
            }
        )


def synthesize_video_batch(batch: pa.Table) -> pa.Table:
    """Deterministic VIDEO rows derived from doc_id (test fixture
    generator).  Payloads are REAL encodings — monochrome YUV4MPEG2
    streams (32x32, n_frames varying with the id) — so FrameSampler
    exercises genuine container parsing, like synthesize_media_batch's
    PPM/WAV rows."""
    ids = batch.column("doc_id").to_pylist()
    w = h = 32
    payloads, n_frames = [], []
    for i in ids:
        seed = hashlib.sha256(f"video:{i}".encode()).digest()
        nf = 8 + (i % 5) * 4
        frames = _seed_bytes(seed, nf * h * w).reshape(nf, h, w)
        payloads.append(encode_y4m(frames))
        n_frames.append(nf)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "kind": pa.array(["video"] * len(ids)),
            "mime": pa.array(["video/x-yuv4mpeg"] * len(ids)),
            "width": pa.array([w] * len(ids), type=pa.int32()),
            "height": pa.array([h] * len(ids), type=pa.int32()),
            "n_frames": pa.array(n_frames, type=pa.int32()),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def resize_images(ds, target: int = 8, fake_decoder: bool = False,
                  concurrency=None, batch_size: int = 16):
    return ds.map_batches(
        ImageResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_media_pool(concurrency),
        fn_constructor_kwargs={"target": target, "fake_decoder": fake_decoder},
    )


def sample_frames(ds, stride: int = 4, fake_decoder: bool = False,
                  concurrency=None, batch_size: int = 8):
    # small batch_size: a video batch x concurrency must fit the worker
    # heap once payloads are real encodings
    return ds.map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_media_pool(concurrency),
        fn_constructor_kwargs={"stride": stride, "fake_decoder": fake_decoder},
    )
