"""Baseline-JFIF codec tests (round 4, VERDICT r3 missing #2).

Evidence layers:
1. clean-room pipeline model — an independent per-sum DCT coding of the
   encode-quantize-decode path (no matrix reuse from the engine) must
   match the full byte path within rounding (±1/pixel): proves the
   huffman/marker layer round-trips quantized coefficients exactly.
2. javax.imageio cross-validation — the JVM's production JPEG codec
   decodes our bytes (and we decode its bytes) to near-identical pixels.
3. structural paths: 4:2:0, restart markers, odd sizes, grayscale,
   progressive rejection.
"""

import math

import numpy as np
import pytest

from osm_read_enhanced_spark.functions.codecs import psnr
from osm_read_enhanced_spark.functions.jpeg import (
    _QT_CHROMA,
    _QT_LUMA,
    decode_jpeg,
    encode_jpeg,
    quality_scaled_qt,
)
from osm_read_enhanced_spark.sources.images import render_image


# ---------------------------------------------------------- clean-room model


def _dct2_ref(block):
    """Direct O(n^4) DCT-II per the textbook formula — no shared code
    with the engine's matrix kernel."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
            cv = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


def _idct2_ref(coef):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
                    cv = math.sqrt(1 / 8) if v == 0 else math.sqrt(2 / 8)
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s
    return out


def _model_roundtrip_444(img, quality):
    """Independent model of encode(4:4:4)+decode: RGB→YCbCr → per-block
    DCT/quant/dequant/IDCT → YCbCr→RGB, plain python loops."""
    h, w = img.shape[:2]
    qt = [
        quality_scaled_qt(_QT_LUMA, quality),
        quality_scaled_qt(_QT_CHROMA, quality),
        quality_scaled_qt(_QT_CHROMA, quality),
    ]
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    ycc = np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ],
        axis=-1,
    )
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    pad = np.empty((ph, pw, 3))
    pad[:h, :w] = ycc
    pad[h:, :w] = pad[h - 1 : h, :w]
    pad[:, w:] = pad[:, w - 1 : w]
    rec = np.empty_like(pad)
    for c in range(3):
        for by in range(ph // 8):
            for bx in range(pw // 8):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] - 128.0
                q = np.round(_dct2_ref(blk) / qt[c]) * qt[c]
                rec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, c] = _idct2_ref(q) + 128.0
    y, cb, cr = rec[:h, :w, 0], rec[:h, :w, 1] - 128, rec[:h, :w, 2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def test_byte_path_matches_cleanroom_model():
    """The full marker+huffman byte path must reproduce the clean-room
    quantization model within ±1 (float rounding) — i.e. entropy coding
    is lossless over the quantized coefficients."""
    img = render_image(5, w=24, h=16)
    for q in (75, 92):
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        model = _model_roundtrip_444(img, q)
        diff = np.abs(dec.astype(int) - model.astype(int))
        assert diff.max() <= 1, (q, diff.max())


# ---------------------------------------------------------- structural paths


def test_roundtrip_psnr_thresholds():
    img = render_image(7, w=64, h=64)
    assert psnr(img, decode_jpeg(encode_jpeg(img, quality=95))) >= 40.0
    assert psnr(img, decode_jpeg(encode_jpeg(img, quality=75))) >= 28.0
    # subsampled loses chroma on these high-chroma synthetics but stays sane
    assert psnr(img, decode_jpeg(encode_jpeg(img, quality=95, subsample=True))) >= 25.0


@pytest.mark.parametrize("w,h", [(17, 13), (8, 8), (40, 24), (33, 31)])
def test_odd_sizes_roundtrip(w, h):
    img = render_image(2, w=w, h=h)
    for sub in (False, True):
        dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        assert dec.shape == img.shape


def test_flat_image_exact():
    flat = np.full((16, 24, 3), 180, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 90)), flat)


def test_restart_markers_decode_identically():
    """DRI/RSTn segmentation must not change decoded pixels (same
    quantized coefficients, predictors reset per interval)."""
    img = render_image(9, w=48, h=48)
    plain = encode_jpeg(img, quality=90)
    rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert rst != plain and b"\xff\xdd" in rst
    assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain))
    # and with subsampling (fewer, bigger MCUs)
    rst2 = encode_jpeg(img, quality=90, subsample=True, restart_interval=1)
    assert np.array_equal(
        decode_jpeg(rst2), decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    )


def test_unsupported_sof_rejected():
    """Lossless/hierarchical SOFs still reject clearly (progressive is
    now SUPPORTED — see test_we_decode_jvm_progressive); a file that
    CLAIMS progressive but carries a baseline scan errors as corrupt."""
    data = bytearray(encode_jpeg(render_image(0), 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC3  # SOF0 → SOF3 (lossless sequential)
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(data))
    data[i + 1] = 0xC2  # progressive header over a baseline scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


# ------------------------------------------------- javax.imageio cross-check


def _jvm_decode(jvm, data):
    bim = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(bytearray(data)))
    assert bim is not None, "javax.imageio failed to parse our bytes"
    w, h = bim.getWidth(), bim.getHeight()
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            rgb = bim.getRGB(x, y)
            out[y, x] = [(rgb >> 16) & 255, (rgb >> 8) & 255, rgb & 255]
    return out


def test_jvm_imageio_decodes_our_bytes(spark):
    """An independent production decoder must agree with ours on our
    encoder's output — validates tables, zigzag, markers, color math."""
    jvm = spark._jvm
    img = render_image(3, w=32, h=32)
    for sub in (False, True):
        data = encode_jpeg(img, quality=92, subsample=sub)
        theirs = _jvm_decode(jvm, data)
        ours = decode_jpeg(data)
        assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 2, sub
    # restart-marker stream parses in the production decoder too
    data = encode_jpeg(img, quality=92, restart_interval=2)
    assert np.abs(_jvm_decode(jvm, data).astype(int) - decode_jpeg(data).astype(int)).max() <= 2


def test_we_decode_jvm_bytes(spark):
    """Bytes produced by javax.imageio (4:2:0, its own huffman choices)
    must decode to near-identical pixels in our decoder."""
    jvm = spark._jvm
    img = render_image(3, w=32, h=32)
    bim = jvm.java.awt.image.BufferedImage(32, 32, 1)  # TYPE_INT_RGB
    for y in range(32):
        for x in range(32):
            r, g, b = (int(v) for v in img[y, x])
            bim.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bim, "jpg", baos)
    data = bytes(baos.toByteArray())
    ours = decode_jpeg(data)
    theirs = _jvm_decode(jvm, data)
    assert psnr(theirs, ours) >= 45.0
    assert np.abs(theirs.astype(int) - ours.astype(int)).max() <= 4


def test_we_decode_jvm_progressive(spark):
    """PROGRESSIVE (SOF2) decode — round 4: javax.imageio's progressive
    writer emits real multi-scan files (DC first Al=1 + spectral AC
    bands + DC/AC successive-approximation refinements, verified by
    marker dump); our decoder must match the JVM's own decode of them
    near-exactly, incl. the 4:2:0 chroma and a non-multiple-of-16
    size."""
    jvm = spark._jvm

    def encode_progressive(img):
        h, w = img.shape[:2]
        bim = jvm.java.awt.image.BufferedImage(w, h, 1)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in img[y, x])
                bim.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        baos = jvm.java.io.ByteArrayOutputStream()
        ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
        writer.setOutput(ios)
        writer.write(None, jvm.javax.imageio.IIOImage(bim, None, None), param)
        ios.flush()
        return bytes(baos.toByteArray())

    for idx, (w, h) in [(3, (32, 32)), (11, (40, 24))]:
        img = render_image(idx, w=w, h=h)
        data = encode_progressive(img)
        assert b"\xff\xc2" in data  # really SOF2
        ours = decode_jpeg(data)
        theirs = _jvm_decode(jvm, data)
        diff = np.abs(theirs.astype(int) - ours.astype(int))
        assert diff.max() <= 7 and diff.mean() < 1.0, (idx, diff.max())
        assert psnr(theirs, ours) >= 45.0


def test_we_decode_jvm_grayscale(spark):
    """Single-component (grayscale) JPEG from the JVM encoder.

    Comparison is against the decoded image's RAW raster samples — Java
    TYPE_BYTE_GRAY is a LINEAR gray space, so getRGB() applies a
    linear→sRGB conversion that is a BufferedImage color-management
    step, not part of JPEG decoding (found the hard way: getRGB values
    sat ~70 levels above the stored samples)."""
    jvm = spark._jvm
    img = render_image(4, w=24, h=24)
    gray = (img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    bim = jvm.java.awt.image.BufferedImage(24, 24, 10)  # TYPE_BYTE_GRAY
    raster = bim.getRaster()
    for y in range(24):
        for x in range(24):
            raster.setSample(x, y, 0, int(gray[y, x]))
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(bim, "jpg", baos)
    data = bytes(baos.toByteArray())
    ours = decode_jpeg(data)
    assert ours.shape == (24, 24, 3)
    bim2 = jvm.javax.imageio.ImageIO.read(
        jvm.java.io.ByteArrayInputStream(bytearray(data))
    )
    r2 = bim2.getRaster()
    theirs = np.array(
        [[r2.getSample(x, y, 0) for x in range(24)] for y in range(24)], dtype=np.int64
    )
    assert np.abs(theirs - ours[..., 0].astype(np.int64)).max() <= 2
    # and the three replicated channels are identical
    assert np.array_equal(ours[..., 0], ours[..., 1])
    assert np.array_equal(ours[..., 0], ours[..., 2])
    # sanity: decode tracks the source gray closely at ImageIO's quality
    assert np.abs(ours[..., 0].astype(np.int64) - gray.astype(np.int64)).mean() <= 3.0


# ------------------------------------------------------------ q55 invariants


def test_q55_nonsubsampled_rows_clear_40db(spark):
    """North-rule lossy invariant: PSNR≥40 dB on the 4:4:4 q95 rows."""
    from pyspark.sql import functions as F

    from osm_read_enhanced_spark.operators.multimodal import jpeg_decode_report
    from osm_read_enhanced_spark.sources.images import build_jpeg_images_df

    imgs = build_jpeg_images_df(spark, n=12, partitions=2)
    rep = jpeg_decode_report(imgs).collect()
    assert len(rep) == 12
    for r in rep:
        idx = int(r.image_id.split("_")[-1])
        if idx % 3 != 2:  # 4:4:4 rows: the 40 dB north-rule bar
            assert r.psnr_db >= 40.0, (r.image_id, r.psnr_db)
        else:  # 4:2:0 rows on saturated-chroma synthetics
            assert r.psnr_db >= 25.0, (r.image_id, r.psnr_db)
        assert r.psnr_ok, (r.image_id, r.psnr_db)
        assert r.phash_hamming <= 4, (r.image_id, r.phash_hamming)
