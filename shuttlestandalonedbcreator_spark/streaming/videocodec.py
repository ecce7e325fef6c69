"""Real video container for the multimodal pipeline — no native libs.

A deployment normally registers ffmpeg/PyAV here. This container has
no video libraries, so the default `video` codec is an MJPEG-shaped
frame container of our own: like MJPEG-in-AVI, the stream is just a
sequence of independently-decodable still images with timestamps — no
inter-frame prediction — which is the one video layout decodable with
zero dependencies (each frame is a PNG handled by
``streaming/imagecodec.py``). Formats that genuinely need codec
libraries (H.264/VP9 motion compensation, MP4/MKV demuxing) still fail
loudly with a register-a-codec message, preserving the loud-fail
contract for unsupported bytes.

Layout (big-endian, deterministic):

    b"SSVF" | u8 version=1 | u32 n_frames |
    n_frames x ( u32 ts_ms | u32 length | <length> PNG bytes )

Decode output is ``[(ts_ms, png_bytes), ...]`` in stored order; frame
pixel access goes through the PNG codec. Encode validates that every
frame payload is a PNG so a decoded container never holds bytes the
frame pipeline can't read.
"""

from __future__ import annotations

import struct

MAGIC = b"SSVF"
_VERSION = 1
# PNG signature inlined (not imported from imagecodec) so this module
# stays executor-safe when shipped by value — an in-function import of
# a sibling module would need the repo importable on the worker
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class VideoFormatError(ValueError):
    """Raised for bytes this codec cannot handle — the message always
    says how to plug in a richer codec (ffmpeg/PyAV) for the format."""


def sniff(data: bytes) -> str | None:
    """Best-effort container sniff for error messages."""
    if data[:4] == MAGIC:
        return "ssvf"
    if data[4:8] == b"ftyp":
        return "mp4"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "mkv/webm"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data and data[0] == 0x47 and len(data) > 188 and data[188] == 0x47:
        return "mpeg-ts"
    return None


def _require_ssvf(data: bytes) -> None:
    kind = sniff(data)
    if kind != "ssvf":
        raise VideoFormatError(
            f"unsupported video format {kind or 'unknown'!r}: the stdlib "
            "codec handles the SSVF PNG-frame container only — register a "
            "richer decoder (ffmpeg/PyAV) via multimodal.register_decoder()"
        )


def encode_video(frames: list[tuple[int, bytes]]) -> bytes:
    """[(ts_ms, png_bytes), ...] -> container bytes."""
    parts = [MAGIC, struct.pack(">BI", _VERSION, len(frames))]
    last_ts = -1
    for ts_ms, png in frames:
        if ts_ms < 0 or ts_ms <= last_ts:
            raise VideoFormatError("frame timestamps must increase strictly")
        if bytes(png[:8]) != _PNG_SIG:
            raise VideoFormatError("SSVF frames must be PNG payloads")
        parts.append(struct.pack(">II", ts_ms, len(png)))
        parts.append(bytes(png))
        last_ts = ts_ms
    return b"".join(parts)


def decode_video(data: bytes) -> list[tuple[int, bytes]]:
    """Container bytes -> [(ts_ms, png_bytes), ...]."""
    _require_ssvf(data)
    if len(data) < 9:
        raise VideoFormatError("truncated SSVF header")
    version, n_frames = struct.unpack(">BI", data[4:9])
    if version != _VERSION:
        raise VideoFormatError(f"unsupported SSVF version {version}")
    frames: list[tuple[int, bytes]] = []
    pos = 9
    for _ in range(n_frames):
        if pos + 8 > len(data):
            raise VideoFormatError("truncated SSVF frame header")
        ts_ms, length = struct.unpack(">II", data[pos:pos + 8])
        png = data[pos + 8:pos + 8 + length]
        if len(png) != length:
            raise VideoFormatError("truncated SSVF frame payload")
        frames.append((ts_ms, png))
        pos += 8 + length
    if pos != len(data):
        raise VideoFormatError("trailing bytes after the last SSVF frame")
    return frames


def default_video_decoder():
    """Feature decoder for multimodal.register_decoder('video', ...):
    duration from the last timestamp, dimensions from the first frame's
    PNG header."""
    from shuttlestandalonedbcreator_spark.streaming import imagecodec

    def decode(data: bytes) -> dict:
        frames = decode_video(bytes(data))
        feats: dict = {"duration_ms": frames[-1][0] if frames else 0}
        if frames:
            w, h, _ch, _px = imagecodec.decode_png(bytes(frames[0][1]))
            feats["width"], feats["height"] = w, h
        return feats

    return decode


def default_video_frame_sampler():
    """Frame sampler for multimodal.register_frame_sampler('video', ...):
    n evenly-spaced real frames (ts_ms, png_bytes) from the container —
    ffmpeg keyframe extraction has the same signature in a deployment."""

    def sample(data: bytes, n: int) -> list[tuple[int, bytes]]:
        frames = decode_video(bytes(data))
        if not frames:
            return []
        n = max(min(n, len(frames)), 1)
        step = len(frames) / n
        return [frames[int(i * step)] for i in range(n)]

    return sample
