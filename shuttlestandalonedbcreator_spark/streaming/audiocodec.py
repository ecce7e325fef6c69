"""Real audio codec for the multimodal pipeline — no native libs needed.

A deployment normally registers torchaudio/soundfile here. This
container has no audio libraries, so the default `audio` codec is a
self-contained WAV (RIFF PCM) encoder/decoder written from the public
RIFF/WAVE specification (Microsoft/IBM Multimedia Programming
Interface, 1991; the format every `wave`-stdlib or libsndfile tool
emits for uncompressed PCM): a RIFF container with a `fmt ` chunk
(format tag 1 = integer PCM) and a `data` chunk of little-endian
samples — `struct` is all it takes. Compressed formats that genuinely
need codec libraries (MP3's MDCT, Vorbis, AAC, FLAC's rice coding)
still fail loudly with a register-a-codec message, preserving the
loud-fail contract for unsupported bytes.

Supported WAV subset (covers everything our encoder or a typical
``wave.open(..., 'wb')`` of 16-bit mono/stereo PCM emits): format tag 1
(PCM), bits-per-sample 16, any sample rate / channel count; unknown
RIFF chunks (LIST, fact, cue) are skipped per spec. Float WAV
(format 3) and compressed tags are rejected loudly.

Decode output is ``(sample_rate, channels, n_frames, pcm)`` with pcm a
bytes object of length n_frames*channels*2 (16-bit LE interleaved).
Encode emits the canonical 44-byte-header single-data-chunk layout.
"""

from __future__ import annotations

import struct

_FMT_PCM = 1
_BITS = 16


class AudioFormatError(ValueError):
    """Raised for bytes this codec cannot handle — the message always
    says how to plug in a richer codec for the format."""


def sniff(data: bytes) -> str | None:
    """Best-effort container sniff for error messages."""
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:3] == b"ID3" or (len(data) >= 2 and data[0] == 0xFF and data[1] & 0xE0 == 0xE0):
        return "mp3"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    if data[4:8] == b"ftyp":
        return "m4a"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    return None


def _require_wav(data: bytes) -> None:
    kind = sniff(data)
    if kind != "wav":
        raise AudioFormatError(
            f"unsupported audio format {kind or 'unknown'!r}: the stdlib "
            "codec handles PCM WAV only — register a richer decoder "
            "(torchaudio/soundfile/ffmpeg) via multimodal.register_decoder()"
        )


def encode_wav(sample_rate: int, channels: int, pcm: bytes) -> bytes:
    """16-bit LE PCM frames -> canonical RIFF/WAVE bytes."""
    if channels < 1:
        raise AudioFormatError("channels must be >= 1")
    block_align = channels * _BITS // 8
    if len(pcm) % block_align:
        raise AudioFormatError(
            f"pcm length {len(pcm)} is not a multiple of the "
            f"{block_align}-byte frame (16-bit x {channels}ch)"
        )
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", _FMT_PCM, channels, sample_rate, byte_rate, block_align, _BITS
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """RIFF/WAVE bytes -> (sample_rate, channels, n_frames, pcm)."""
    _require_wav(data)
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise AudioFormatError("truncated RIFF container")
    pos, end = 12, 8 + riff_size
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if len(body) != size:
            raise AudioFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise AudioFormatError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        # unknown chunks (LIST, fact, cue ...) skipped per spec
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioFormatError("WAV missing fmt or data chunk")
    tag, channels, rate, _byte_rate, block_align, bits = fmt
    if tag != _FMT_PCM or bits != _BITS:
        raise AudioFormatError(
            f"unsupported WAV encoding (format tag {tag}, {bits}-bit): the "
            "stdlib codec handles 16-bit integer PCM only — register a "
            "richer decoder via multimodal.register_decoder()"
        )
    if block_align != channels * _BITS // 8:
        raise AudioFormatError("inconsistent block alignment in fmt chunk")
    if len(pcm) % block_align:
        raise AudioFormatError("data chunk is not frame-aligned")
    return rate, channels, len(pcm) // block_align, pcm


def default_audio_decoder():
    """Feature decoder for multimodal.register_decoder('audio', ...):
    duration from the header-declared rate and the frame count."""

    def decode(data: bytes) -> dict:
        rate, _channels, n_frames, _pcm = decode_wav(bytes(data))
        return {"duration_ms": n_frames * 1000 // max(rate, 1)}

    return decode
