"""A/V multimodal legs: container/WAV round trips, random-access frame
decode, analytic anchors for the audio feature kernels (pure-tone
closed forms), and the Spark operators vs raw-array expectations."""

import numpy as np
import pytest

from osm_read_enhanced_spark.functions import av


def test_video_container_roundtrip_and_random_access():
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (5, 16, 24, 3), dtype=np.uint8)
    data = av.encode_video(frames, fps=12)
    dec, fps = av.decode_video(data)
    assert fps == 12 and np.array_equal(dec, frames)
    for i in (0, 3, 4):
        assert np.array_equal(av.decode_video_frame(data, i), frames[i])
    with pytest.raises(IndexError):
        av.decode_video_frame(data, 5)
    with pytest.raises(ValueError):
        av.decode_video(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        av.decode_video(data[:-10])  # truncated payload


def test_wav_roundtrip_is_real_riff():
    pcm = (np.sin(np.linspace(0, 40, 1000)) * 20000).astype(np.int16)
    data = av.encode_wav(pcm, 8000)
    # byte-level RIFF structure, not just our own reader
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt " and int.from_bytes(data[24:28], "little") == 8000
    out, sr = av.decode_wav(data)
    assert sr == 8000 and np.array_equal(out, pcm)
    with pytest.raises(ValueError):
        av.decode_wav(b"JUNK" + data[4:])


def test_audio_features_match_pure_tone_closed_forms():
    """Independent anchors: for s(t) = A·sin(2πft), RMS = A/√2,
    ZCR = 2f/sr, spectral centroid = f (discretization tolerances)."""
    sr, n = 8000, 4096
    for f, a in ((440.0, 10000.0), (1000.0, 4000.0), (250.0, 20000.0)):
        t = np.arange(n) / sr
        pcm = np.round(a * np.sin(2 * np.pi * f * t)).astype(np.int16)
        assert abs(av.audio_rms(pcm) - a / np.sqrt(2)) / (a / np.sqrt(2)) < 0.01
        assert abs(av.audio_zcr(pcm) - 2 * f / sr) / (2 * f / sr) < 0.02
        assert abs(av.audio_spectral_centroid(pcm, sr) - f) / f < 0.02


def test_sample_frames_matches_raw_renders(spark):
    from osm_read_enhanced_spark.functions import codecs
    from osm_read_enhanced_spark.operators.multimodal import sample_frames
    from osm_read_enhanced_spark.sources.av import build_videos_df, render_video

    vids = build_videos_df(spark, n=6, n_frames=8, partitions=2)
    got = {
        (r.video_id, r.frame_index): codecs.decode_image(bytes(r.frame_bytes), "ppm")
        for r in sample_frames(vids, every=3).collect()
    }
    assert set(i for _, i in got) == {0, 3, 6}
    for idx in range(6):
        raw = render_video(idx, n_frames=8)
        for i in (0, 3, 6):
            assert np.array_equal(got[(f"vid_{idx:08d}", i)], raw[i])


def test_audio_features_operator_matches_raw(spark):
    from osm_read_enhanced_spark.operators.multimodal import audio_features
    from osm_read_enhanced_spark.sources.av import build_audio_df, render_tone

    clips = build_audio_df(spark, n=8, partitions=2)
    got = {r.clip_id: (r.rms, r.zcr, r.centroid_hz) for r in audio_features(clips).collect()}
    assert len(got) == 8
    for idx in range(8):
        pcm = render_tone(idx)
        want = (av.audio_rms(pcm), av.audio_zcr(pcm), av.audio_spectral_centroid(pcm, 8000))
        assert got[f"clip_{idx:08d}"] == pytest.approx(want, rel=1e-12)


def test_sample_frame_stats_equals_bytes_path(spark):
    """The stats-direct sampler (round 4) must agree exactly with the
    frame-bytes sampler + lossless decode — same frames, same means."""
    import numpy as np

    from osm_read_enhanced_spark.functions import codecs
    from osm_read_enhanced_spark.operators.multimodal import (
        sample_frame_stats,
        sample_frames,
    )
    from osm_read_enhanced_spark.sources.av import build_videos_df

    vids = build_videos_df(spark, n=4, n_frames=6, partitions=2)
    direct = {
        (r.video_id, r.frame_index): (r.w, r.h, r.mean_rgb)
        for r in sample_frame_stats(vids, every=2).collect()
    }
    via_bytes = {}
    for r in sample_frames(vids, every=2).collect():
        arr = codecs.decode_image(bytes(r.frame_bytes), "ppm")
        via_bytes[(r.video_id, r.frame_index)] = (
            r.w, r.h, float(arr.astype(np.float64).mean())
        )
    assert direct.keys() == via_bytes.keys() and len(direct) == 4 * 3
    for k, (w, h, m) in direct.items():
        w2, h2, m2 = via_bytes[k]
        assert (w, h) == (w2, h2) and abs(m - m2) < 1e-12, k
