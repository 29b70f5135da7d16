"""Audio/video payload kernels (numpy, no external libs) — the A/V leg
of the multimodal surface (build brief: decode / feature-extract /
frame-sample as Arrow-batch UDFs; jpeg/mp3/mp4 stay import-gated stubs
in ``multimodal.decode_external_format``).

Real, minimal public formats so the plumbing is honestly testable:
- video: an uncompressed raw-RGB container (magic ``VID0`` + u16
  w/h/n_frames/fps + n·h·w·3 bytes) — frame extraction, indexing and
  per-frame stats are exactly the operations a real container needs.
- audio: RIFF/WAVE PCM16 mono — the actual public WAV format
  (RIFF spec), byte-compatible with any WAV reader.
Features: RMS, zero-crossing rate, spectral centroid (rfft) — standard
definitions, analytically anchorable on pure tones.
"""

from __future__ import annotations

import struct

import numpy as np

VIDEO_MAGIC = b"VID0"


def encode_video(frames: np.ndarray, fps: int = 10) -> bytes:
    """frames (n, h, w, 3) uint8 → container bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    return VIDEO_MAGIC + struct.pack("<HHHH", w, h, n, fps) + frames.tobytes()


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """container bytes → (frames (n, h, w, 3) uint8, fps)."""
    if bytes(data[:4]) != VIDEO_MAGIC:
        raise ValueError(f"not a VID0 container (magic {bytes(data[:4])!r})")
    w, h, n, fps = struct.unpack("<HHHH", bytes(data[4:12]))
    need = n * h * w * 3
    body = np.frombuffer(bytes(data[12 : 12 + need]), dtype=np.uint8)
    if body.size != need:
        raise ValueError(f"truncated video: {body.size} of {need} payload bytes")
    return body.reshape(n, h, w, 3), fps


def decode_video_frame(data: bytes, index: int) -> np.ndarray:
    """Random access decode of ONE frame — O(frame), not O(video):
    the header gives the exact byte range, like a real container's
    frame index. This is what lets frame sampling skip decode work."""
    if bytes(data[:4]) != VIDEO_MAGIC:
        raise ValueError(f"not a VID0 container (magic {bytes(data[:4])!r})")
    w, h, n, _fps = struct.unpack("<HHHH", bytes(data[4:12]))
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range [0, {n})")
    fsz = h * w * 3
    off = 12 + index * fsz
    return (
        np.frombuffer(bytes(data[off : off + fsz]), dtype=np.uint8).reshape(h, w, 3)
    )


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM → RIFF/WAVE bytes (the standard public format)."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (samples int16, sample_rate).
    Walks RIFF chunks (a real reader does; extra chunks are legal)."""
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, sr, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag, size = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            audio_fmt, channels, sr = struct.unpack("<HHI", body[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError(f"only PCM mono supported (fmt={audio_fmt}, ch={channels})")
        elif tag == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    return pcm, sr


def audio_rms(samples: np.ndarray) -> float:
    x = samples.astype(np.float64)
    return float(np.sqrt(np.mean(x * x)))


def audio_zcr(samples: np.ndarray) -> float:
    """Zero-crossing rate: sign changes per sample (0..1)."""
    s = np.signbit(samples.astype(np.float64))
    return float(np.count_nonzero(s[1:] != s[:-1]) / max(len(samples) - 1, 1))


def audio_spectral_centroid(samples: np.ndarray, sample_rate: int) -> float:
    """Magnitude-weighted mean frequency in Hz (DC excluded), Hann-
    windowed: without a window, a tone that isn't bin-aligned leaks
    slowly-decaying sinc tails across the whole spectrum and drags the
    centroid far off (measured: 440 Hz → 697 Hz at 4096/8000); Hann's
    −31 dB sidelobes confine the mass to the mainlobe."""
    x = samples.astype(np.float64)
    x = x * np.hanning(len(x))
    mag = np.abs(np.fft.rfft(x))[1:]
    freqs = np.fft.rfftfreq(len(x), d=1.0 / sample_rate)[1:]
    tot = mag.sum()
    if tot == 0:
        return 0.0
    return float((freqs * mag).sum() / tot)
