"""Images table + multimodal operators + payload invariants
(north_rule: decoded-pixel allclose / PSNR≥40dB + caption + phash)."""

import pytest
from pyspark.sql import functions as F

from osm_read_enhanced_spark.sources.images import (
    build_images_df,
    write_images_table,
)
from osm_read_enhanced_spark.operators.multimodal import (
    decode_external_format,
    decode_stats,
    resize_images,
    verify_payloads,
)
from osm_read_enhanced_spark.sources import iceberg_lite as il


@pytest.fixture(scope="module")
def images(spark):
    return build_images_df(spark, n=48, partitions=4).cache()


def test_images_schema_and_determinism(spark, images):
    rows = {r.image_id: r for r in images.collect()}
    assert len(rows) == 48
    again = {r.image_id: r for r in build_images_df(spark, n=48, partitions=2).collect()}
    for k in rows:
        assert bytes(rows[k].bytes) == bytes(again[k].bytes)
        assert rows[k].caption == again[k].caption
        assert rows[k].phash == again[k].phash


def test_payload_invariants(spark, images):
    res = verify_payloads(images).collect()
    assert len(res) == 48
    bad = [r for r in res if not (r.pixels_ok and r.phash_ok)]
    assert bad == []
    lossy = [r for r in res if r.fmt == "dct"]
    assert lossy and all(r.psnr_db >= 40.0 for r in lossy)


def test_caption_equality(images):
    # caption embeds lat/lon/fmt — regenerate from row fields and compare
    rows = images.select("image_id", "caption", "fmt", "lat", "lon").collect()
    for r in rows:
        idx = int(r.image_id.split("_")[-1])
        assert r.caption == f"image {idx:012d} ({r.fmt}) near lat={r.lat:.3f} lon={r.lon:.3f}"


def test_decode_stats_values(images):
    stats = decode_stats(images)
    rows = stats.collect()
    assert len(rows) == 48
    assert all(0 <= r.mean_r <= 255 for r in rows)
    # phash column from decode matches the stored phash for lossless fmts
    joined = (
        images.select("image_id", "fmt", "phash")
        .join(stats.select("image_id", "phash_decoded"), "image_id")
        .filter(F.col("fmt") != "dct")
    )
    assert all(r.phash == r.phash_decoded for r in joined.collect())


def test_resize(images):
    small = resize_images(images.limit(8), 8, 8)
    rows = small.collect()
    assert all((r.w, r.h, r.fmt) == (8, 8, "png") for r in rows)


def test_images_iceberg_table_resume(spark, tmp_path):
    table = str(tmp_path / "imgs")
    recs = write_images_table(spark, table, n=32, buckets=4)
    assert len(recs) == 4
    again = write_images_table(spark, table, n=32, buckets=4)
    assert again == []  # fully committed → resume writes nothing
    assert il.read_table(spark, table).count() == 32


def test_external_decode_stub(images):
    with pytest.raises(NotImplementedError, match="Pillow|ffmpeg"):
        decode_external_format(images, "jpeg")


def test_geotag_skew_cluster(spark):
    # the dense urban cluster must be present (skew exercise, FIXTURES B1)
    df = build_images_df(spark, n=400, partitions=4)
    n_cluster = df.filter(
        (F.abs(F.col("lat") - 51.5074) < 0.1) & (F.abs(F.col("lon") + 0.1078) < 0.1)
    ).count()
    assert n_cluster > 100  # ≈40% of 400


# --------------------------------------------- de-circularized q36 evidence
# The q36/q37 driver oracles are pinned from engine output; this test
# provides the INDEPENDENT leg: expected channel stats computed straight
# from the deterministic generator's raw pixel arrays (render_image),
# never touching the codec encode/decode path the query exercises.

def test_decode_stats_match_generator_analytics(spark):
    import numpy as np

    from osm_read_enhanced_spark.functions import codecs
    from osm_read_enhanced_spark.operators.multimodal import decode_stats
    from osm_read_enhanced_spark.sources.images import _FMTS, build_images_df, render_image

    imgs = build_images_df(spark, n=64, partitions=4)
    got = {r["image_id"]: r for r in decode_stats(imgs).collect()}
    assert len(got) == 64
    n_exact = 0
    for idx in range(64):
        raw = render_image(idx)
        fmt = _FMTS[idx % len(_FMTS)]
        row = got[f"img_{idx:012d}"]
        gray = raw.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        exp = (
            raw[..., 0].mean(), raw[..., 1].mean(), raw[..., 2].mean(), gray.std(),
        )
        obs = (row["mean_r"], row["mean_g"], row["mean_b"], row["std_gray"])
        if fmt == "dct":  # lossy: PSNR≥40dB bounds the drift
            for e, o in zip(exp, obs):
                assert abs(e - o) < 2.0, (idx, fmt, exp, obs)
        else:  # lossless: decode must reproduce the raw pixels exactly
            for e, o in zip(exp, obs):
                assert abs(e - o) < 1e-9 + 5e-3, (idx, fmt, exp, obs)
            assert row["phash_decoded"] == codecs.phash64(raw)
            n_exact += 1
    assert n_exact == 48  # 3 of 4 formats are lossless


def test_image_neardup_pairs_vs_bruteforce(spark):
    """Operator == clean-room numpy all-pairs hamming over phashes
    computed straight from the kernels (no Spark path involved), and the
    planted variants are actually found."""
    from osm_read_enhanced_spark.functions.codecs import phash64
    from osm_read_enhanced_spark.operators.multimodal import image_neardup_pairs
    from osm_read_enhanced_spark.sources.images import (
        build_images_with_variants,
        render_image,
        variant_image,
    )

    imgs = build_images_with_variants(spark, n_base=72, every=3, partitions=4)
    got = {
        (r.image_a, r.image_b): r.hamming
        for r in image_neardup_pairs(imgs, max_hamming=6).collect()
    }

    # clean-room expectation
    ph = {}
    for idx in range(72):
        ph[f"img_{idx:012d}"] = phash64(render_image(idx))
        if idx % 3 == 0:
            ph[f"var_{idx:012d}"] = phash64(variant_image(idx))
    ids = sorted(ph)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((ph[a] ^ ph[b]) & (2**64 - 1)).count("1")
            if d <= 6:
                want[(a, b)] = d
    assert got == want
    # the planted variants dominate the pair set
    variant_pairs = {k for k in want if k[0].startswith("img") and k[1].startswith("var")
                     and k[0][4:] == k[1][4:]}
    assert len(variant_pairs) >= 20  # 24 planted; rare high-energy outliers may exceed the radius
    assert variant_pairs <= set(want)


def test_image_dedup_keep_list_transitive(spark):
    """Keep-list composition (round 4): with a transitive chain A~B~C
    the keep-list retains exactly the canonical member per cluster and
    every unpaired image — semantics the raw pair list cannot express."""
    from osm_read_enhanced_spark.operators.multimodal import image_dedup_keep_list

    rows = [
        ("img_a", 0b0000),   # a~b (ham 1), b~c (ham 1), a~c (ham 2) — one cluster
        ("img_b", 0b0001),
        ("img_c", 0b0011),
        ("img_z", ~0 << 20), # far from everything
    ]
    imgs = spark.createDataFrame(rows, "image_id string, phash long")
    keep = {r.image_id: r.keep for r in image_dedup_keep_list(imgs, max_hamming=3).collect()}
    assert keep == {"img_a": True, "img_b": False, "img_c": False, "img_z": True}


def test_image_metadata_header_only(spark):
    """Metadata-only scan: fmt/width/height from headers must match the
    stored columns for every in-repo format INCLUDING jpeg, with the
    format detected from magic bytes (stored fmt untrusted)."""
    from osm_read_enhanced_spark.operators.multimodal import image_metadata
    from osm_read_enhanced_spark.sources.images import (
        build_images_df,
        build_jpeg_images_df,
    )

    total = 0
    for imgs in (
        build_images_df(spark, n=12, partitions=2),
        build_jpeg_images_df(spark, n=6, partitions=2),
    ):
        meta = {r.image_id: r for r in image_metadata(imgs).collect()}
        for r in imgs.select("image_id", "fmt", "w", "h").collect():
            m = meta[r.image_id]
            assert (m.fmt_detected, m.width, m.height) == (r.fmt, r.w, r.h), r.image_id
        total += len(meta)
    assert total == 18
