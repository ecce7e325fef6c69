"""streaming/audiocodec.py + videocodec.py — stdlib WAV / SSVF codecs.

Round-trips are cross-checked against the stdlib ``wave`` module (an
independent RIFF implementation), so a header-layout error in our
encoder cannot hide behind round-trip symmetry with our own decoder.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from shuttlestandalonedbcreator_spark.streaming import audiocodec as AC
from shuttlestandalonedbcreator_spark.streaming import imagecodec as IC
from shuttlestandalonedbcreator_spark.streaming import videocodec as VC


def _pcm(n: int, channels: int = 1) -> bytes:
    rng = np.arange(n * channels, dtype=np.int64)
    return ((rng * 2731 + 17) % 65536 - 32768).astype("<i2").tobytes()


# ---------------------------------------------------------------- audio

def test_wav_roundtrip_mono_and_stereo():
    for channels in (1, 2):
        pcm = _pcm(480, channels)
        data = AC.encode_wav(8000, channels, pcm)
        rate, ch, n_frames, out = AC.decode_wav(data)
        assert (rate, ch, n_frames) == (8000, channels, 480)
        assert out == pcm


def test_wav_encoder_readable_by_stdlib_wave():
    pcm = _pcm(240, 2)
    data = AC.encode_wav(44100, 2, pcm)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 44100
        assert w.getnchannels() == 2
        assert w.getsampwidth() == 2
        assert w.readframes(w.getnframes()) == pcm


def test_wav_decoder_reads_stdlib_wave_output():
    pcm = _pcm(333)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm)
    rate, ch, n_frames, out = AC.decode_wav(buf.getvalue())
    assert (rate, ch, n_frames) == (16000, 1, 333)
    assert out == pcm


def test_wav_decoder_skips_unknown_chunks():
    pcm = _pcm(10)
    data = AC.encode_wav(8000, 1, pcm)
    # splice a LIST chunk (odd-sized, so word-alignment padding is hit)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:12] + extra + data[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, ch, n_frames, out = AC.decode_wav(spliced)
    assert (rate, ch, n_frames, out) == (8000, 1, 10, pcm)


@pytest.mark.parametrize(
    "data,kind",
    [
        (b"ID3\x04\x00" + b"\x00" * 40, "mp3"),
        (b"\xff\xfb\x90\x00" + b"\x00" * 40, "mp3"),
        (b"OggS" + b"\x00" * 40, "ogg"),
        (b"fLaC" + b"\x00" * 40, "flac"),
        (b"\x00\x00\x00 ftypM4A " + b"\x00" * 32, "m4a"),
        (b"FORM\x00\x00\x00\x20AIFF" + b"\x00" * 32, "aiff"),
        (b"garbage", "unknown"),
    ],
)
def test_wav_loud_fail_other_formats(data, kind):
    assert (AC.sniff(data) or "unknown") == kind
    with pytest.raises(AC.AudioFormatError, match="register a richer decoder"):
        AC.decode_wav(data)


def test_wav_rejects_float_and_truncation():
    pcm = _pcm(16)
    data = bytearray(AC.encode_wav(8000, 1, pcm))
    data[20:22] = struct.pack("<H", 3)  # format tag 3 = IEEE float
    with pytest.raises(AC.AudioFormatError, match="format tag 3"):
        AC.decode_wav(bytes(data))
    good = AC.encode_wav(8000, 1, pcm)
    with pytest.raises(AC.AudioFormatError):
        AC.decode_wav(good[:30])
    with pytest.raises(AC.AudioFormatError, match="not a multiple"):
        AC.encode_wav(8000, 2, b"\x00\x01\x02")  # 3 bytes, 4-byte frames


def test_default_audio_decoder_duration():
    decode = AC.default_audio_decoder()
    feats = decode(AC.encode_wav(8000, 1, _pcm(4000)))
    assert feats["duration_ms"] == 500


# ---------------------------------------------------------------- video

def _png_frames(n: int, w: int = 4, h: int = 3):
    frames = []
    for f in range(n):
        px = bytes((f * 31 + i) % 256 for i in range(w * h))
        frames.append((f * 40, IC.encode_png(w, h, 1, px)))
    return frames


def test_ssvf_roundtrip_and_pixels():
    frames = _png_frames(5)
    data = VC.encode_video(frames)
    out = VC.decode_video(data)
    assert out == frames
    for f, (_ts, png) in enumerate(out):
        w, h, ch, px = IC.decode_png(png)
        assert (w, h, ch) == (4, 3, 1)
        assert px == bytes((f * 31 + i) % 256 for i in range(12))


def test_ssvf_empty_and_contract_checks():
    assert VC.decode_video(VC.encode_video([])) == []
    frames = _png_frames(2)
    with pytest.raises(VC.VideoFormatError, match="increase strictly"):
        VC.encode_video([frames[1], frames[0]])
    with pytest.raises(VC.VideoFormatError, match="must be PNG"):
        VC.encode_video([(0, b"not a png")])
    data = VC.encode_video(frames)
    with pytest.raises(VC.VideoFormatError, match="truncated"):
        VC.decode_video(data[:-3])
    with pytest.raises(VC.VideoFormatError, match="trailing bytes"):
        VC.decode_video(data + b"\x00")


@pytest.mark.parametrize(
    "data,kind",
    [
        (b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 24, "mp4"),
        (b"\x1a\x45\xdf\xa3" + b"\x00" * 24, "mkv/webm"),
        (b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 24, "avi"),
        (b"\x47" + b"\x00" * 187 + b"\x47" + b"\x00" * 10, "mpeg-ts"),
        (b"garbage", "unknown"),
    ],
)
def test_ssvf_loud_fail_other_formats(data, kind):
    assert (VC.sniff(data) or "unknown") == kind
    with pytest.raises(VC.VideoFormatError, match="register a richer decoder"):
        VC.decode_video(data)


def test_default_video_decoder_and_sampler():
    frames = _png_frames(10)
    data = VC.encode_video(frames)
    feats = VC.default_video_decoder()(data)
    assert feats["duration_ms"] == 9 * 40
    assert (feats["width"], feats["height"]) == (4, 3)
    sample = VC.default_video_frame_sampler()
    picked = sample(data, 4)
    assert len(picked) == 4
    assert [ts for ts, _ in picked] == sorted({ts for ts, _ in picked})
    assert all(f in frames for f in picked)
    assert sample(data, 99) == frames  # capped at available frames


def test_multimodal_defaults_cover_audio_video(spark):
    """extract_features / sample_frames on real WAV + SSVF bytes via the
    import-time default registrations — the loud-fail modality gap from
    streaming/multimodal.py is closed for the dependency-free formats,
    while MP3 bytes still fail per-row with the register message."""
    from shuttlestandalonedbcreator_spark.streaming import multimodal as M

    M.register_default_image_codecs(overwrite=True)
    M.register_default_av_codecs(overwrite=True)
    wav = AC.encode_wav(8000, 1, _pcm(800))
    vid = VC.encode_video(_png_frames(6))
    mp3 = b"ID3\x04\x00" + b"\x00" * 60
    df = spark.createDataFrame(
        [(1, "audio", bytearray(wav)), (2, "video", bytearray(vid)),
         (3, "audio", bytearray(mp3))],
        "id long, modality string, content binary",
    )
    tagged = M.attach_binary_metadata(df, "content", "id", "modality")
    feats = {r["content_id"]: r for r in M.extract_features(tagged).collect()}
    assert feats[1]["feature_ok"] and feats[1]["duration_ms"] == 100
    assert feats[2]["feature_ok"] and feats[2]["duration_ms"] == 200
    assert (feats[2]["width"], feats[2]["height"]) == (4, 3)
    assert not feats[3]["feature_ok"]
    assert "register a richer decoder" in feats[3]["feature_err"]

    frames = M.sample_frames(tagged.filter("content_id = 2"), n_frames=3).collect()
    assert [r["frame_ok"] for r in frames] == [True] * 3
    assert len({bytes(r["frame"]) for r in frames}) == 3


def test_streaming_av_decode_end_to_end(spark, tmp_path):
    """Streaming integration for the new modalities: WAV and SSVF files
    dropped in a folder flow through readStream(binaryFile) -> metadata
    -> the default codecs' extract_features -> memory sink, per-row E1
    errors intact — audio/video compose with Structured Streaming
    exactly like images (tests/test_imagecodec.py's e2e)."""
    from pyspark.sql import functions as F

    from shuttlestandalonedbcreator_spark.streaming import multimodal as M

    M.register_default_av_codecs(overwrite=True)
    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.wav").write_bytes(AC.encode_wav(8000, 1, _pcm(1600)))
    (src / "b.ssvf").write_bytes(VC.encode_video(_png_frames(8, w=6, h=5)))
    (src / "c.mp3").write_bytes(b"ID3\x04\x00" + b"\x00" * 50)

    stream = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .load(str(src))
        .select(
            F.xxhash64("path").alias("content_id"),
            F.when(F.col("path").endswith(".ssvf"), "video")
            .otherwise("audio")
            .alias("modality"),
            F.octet_length("content").cast("long").alias("n_bytes"),
            F.sha2("content", 256).alias("sha"),
            F.col("content"),
        )
    )
    q = (
        M.extract_features(stream)
        .writeStream.format("memory")
        .queryName("av_feats")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    rows = spark.sql("SELECT * FROM av_feats").collect()
    assert len(rows) == 3
    ok = {r["modality"]: r for r in rows if r["feature_ok"]}
    assert ok["audio"]["duration_ms"] == 200  # 1600 frames @ 8 kHz
    assert ok["video"]["duration_ms"] == 7 * 40
    assert (ok["video"]["width"], ok["video"]["height"]) == (6, 5)
    bad = [r for r in rows if not r["feature_ok"]]
    assert len(bad) == 1 and "register a richer decoder" in bad[0]["feature_err"]


# ------------------------------------------------------------ properties

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=192000),
    st.integers(min_value=1, max_value=4),
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=300),
)
def test_wav_roundtrip_property(rate, channels, samples):
    """encode_wav/decode_wav are exact inverses for ANY frame-aligned
    PCM payload, any rate/channel count."""
    samples = samples[: len(samples) - len(samples) % channels]
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    out_rate, out_ch, n_frames, out = AC.decode_wav(
        AC.encode_wav(rate, channels, pcm)
    )
    assert (out_rate, out_ch) == (rate, channels)
    assert n_frames == len(samples) // channels
    assert out == pcm


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=31),
            st.integers(min_value=1, max_value=9),
            st.binary(min_size=0, max_size=64),
        ),
        max_size=6,
    )
)
def test_ssvf_roundtrip_property(frame_specs):
    """encode_video/decode_video round-trip ANY sequence of PNG frames
    (arbitrary dims, arbitrary gray payload tiled to size), with strictly
    increasing synthetic timestamps."""
    frames = []
    ts = 0
    for w, h, seed in frame_specs:
        need = w * h
        px = ((seed or b"\x00") * (need // max(len(seed), 1) + 1))[:need]
        frames.append((ts, IC.encode_png(w, h, 1, px)))
        ts += 1 + (len(seed) % 37)
    data = VC.encode_video(frames)
    assert VC.decode_video(data) == frames
    for (_, png_in), (_, png_out) in zip(frames, VC.decode_video(data)):
        assert IC.decode_png(png_out) == IC.decode_png(png_in)
