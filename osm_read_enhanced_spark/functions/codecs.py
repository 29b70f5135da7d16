"""Self-contained image codecs + perceptual kernels (pure numpy).

No image libraries exist in this environment (SURVEY.md env facts), so
the engine ships its own codecs for the image payload column:

- PPM (P6)  — raw lossless RGB
- BMP       — 24-bit bottom-up lossless
- PNG       — real zlib-PNG (8-bit RGB, filter 0) writer/reader
- DCT       — simple 8×8 block-DCT quantized lossy format ("dct" fmt)
              to exercise the PSNR≥40 dB verification path
- phash     — 64-bit perceptual hash (32×32 grayscale DCT, top-left
              8×8 median threshold)
- psnr      — peak signal-to-noise ratio

All operate on uint8 arrays of shape (h, w, 3); decode only ever runs
inside Arrow-batched UDFs (BinaryType payloads stay opaque to Spark).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ----------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, _maxv = parts
    return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


# ----------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(img[y, :, ::-1].astype(np.uint8).tobytes() + pad)  # BGR
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack("<I", data[10:14])[0]
    w, h = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    if bpp != 24:
        raise NotImplementedError("only 24-bit BMP")
    row_size = (w * 3 + 3) & ~3
    out = np.empty((abs(h), w, 3), dtype=np.uint8)
    for i in range(abs(h)):
        row = np.frombuffer(data, np.uint8, w * 3, offset + i * row_size).reshape(w, 3)
        y = abs(h) - 1 - i if h > 0 else i
        out[y] = row[:, ::-1]
    return out


# ----------------------------------------------------------------- PNG


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    chunk = tag + payload
    return struct.pack(">I", len(payload)) + chunk + struct.pack(">I", zlib.crc32(chunk))


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    h, w = img.shape[:2]
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    raw = np.empty((h, w * 3 + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = img.astype(np.uint8).reshape(h, w * 3)
    idat = _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), compress_level))
    return sig + ihdr + idat + _png_chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNG")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for y in range(h):  # unfilter (types 0-2 supported; we emit 0)
        ftype = raw[y, 0]
        line = raw[y, 1:].copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub
            for i in range(3, len(line)):
                line[i] = (int(line[i]) + int(line[i - 3])) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter {ftype}")
        out[y] = line
        prev = line
    return out.reshape(h, w, 3)


# ----------------------------------------------------------------- DCT lossy

_DCT_Q = 6.0  # quantization step — keeps PSNR > 40 dB even on noise


def _dct_matrix(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    M = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    M[0] = np.sqrt(1.0 / n)
    return M


_DCT_M = _dct_matrix(8)


def encode_dct(img: np.ndarray) -> bytes:
    """Pad to 8×8 blocks, per-channel block DCT, uniform quantize,
    zlib-pack int16 coefficients."""
    h, w = img.shape[:2]
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    padded = np.zeros((ph, pw, 3), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = padded[h - 1 : h, :w]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8, 3).transpose(0, 2, 4, 1, 3)
    coef = np.einsum("ij,bcdjk,lk->bcdil", _DCT_M, blocks - 128.0, _DCT_M)
    q = np.round(coef / _DCT_Q).astype(np.int16)
    header = struct.pack("<4sHH", b"DCT1", w, h)
    return header + zlib.compress(q.tobytes(), 6)


def decode_dct(data: bytes) -> np.ndarray:
    if data[:4] != b"DCT1":
        raise ValueError("not a DCT1 payload")
    w, h = struct.unpack("<HH", data[4:8])
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    q = np.frombuffer(zlib.decompress(data[8:]), dtype=np.int16).reshape(
        ph // 8, pw // 8, 3, 8, 8
    )
    coef = q.astype(np.float64) * _DCT_Q
    blocks = np.einsum("ji,bcdjk,kl->bcdil", _DCT_M, coef, _DCT_M) + 128.0
    out = blocks.transpose(0, 3, 1, 4, 2).reshape(ph, pw, 3)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)[:h, :w]


# ----------------------------------------------------------------- dispatch

# round 4 adds real baseline-JFIF jpeg (functions/jpeg.py, ITU T.81,
# cross-validated against javax.imageio) — the external-codec stub in
# operators/multimodal.py now covers only webp/mp3/mp4
FORMATS = ("ppm", "bmp", "png", "dct", "jpeg")


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "jpeg":
        from .jpeg import encode_jpeg

        return encode_jpeg(img)
    return {"ppm": encode_ppm, "bmp": encode_bmp, "png": encode_png, "dct": encode_dct}[fmt](img)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "jpeg":
        from .jpeg import decode_jpeg

        return decode_jpeg(data)
    return {"ppm": decode_ppm, "bmp": decode_bmp, "png": decode_png, "dct": decode_dct}[fmt](data)


def is_lossless(fmt: str) -> bool:
    return fmt in ("ppm", "bmp", "png")


# ----------------------------------------------------------------- metrics


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0**2 / mse))


_PHASH_M = _dct_matrix(32)


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash: resize→32×32 gray → DCT → top-left 8×8
    (skip DC) vs median → bit string."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    small = gray[np.ix_(ys, xs)]
    coef = _PHASH_M @ small @ _PHASH_M.T
    block = coef[:8, :8].flatten()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = False
    v = 0
    for i in np.flatnonzero(bits):
        v |= 1 << int(i)
    return int(np.uint64(v).astype(np.int64))


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def sniff_metadata(data: bytes) -> tuple[str, int, int]:
    """→ (fmt, w, h) from the payload HEADER only — no pixel decode, no
    inflate (round 4: the metadata-only scan for images, the image
    analogue of the PBF metadata-only element counts: filter/partition
    on dimensions without paying the decode). Detects by magic bytes."""
    if data[:2] == b"P6":
        # reuse the PPM header walk (stops before pixel data)
        parts, pos = [], 2
        while len(parts) < 2:
            while data[pos : pos + 1].isspace():
                pos += 1
            if data[pos : pos + 1] == b"#":
                while data[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while not data[pos : pos + 1].isspace():
                pos += 1
            parts.append(int(data[start:pos]))
        return "ppm", parts[0], parts[1]
    if data[:2] == b"BM":
        w, h = struct.unpack("<ii", data[18:26])
        return "bmp", w, abs(h)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", data[16:24])
        return "png", w, h
    if data[:4] == b"DCT1":
        w, h = struct.unpack("<HH", data[4:8])
        return "dct", w, h
    if data[:2] == b"\xff\xd8":
        pos = 2
        while pos < len(data) - 1:
            if data[pos] != 0xFF:
                break
            marker = data[pos + 1]
            pos += 2
            if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                continue
            (seglen,) = struct.unpack(">H", data[pos : pos + 2])
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2 carry dimensions
                h, w = struct.unpack(">HH", data[pos + 3 : pos + 7])
                return "jpeg", w, h
            pos += seglen
        raise ValueError("jpeg without SOF header")
    raise ValueError(f"unknown image payload (magic {data[:4]!r})")
