"""Property-based round-trips for the pure-stdlib codecs — no Spark."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from youtube_analytics_lakehouse_databricks_spark.operators import multimodal as mm


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_png_gray_roundtrip_any_pixels(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    dw, dh, out = mm.decode_real_image(mm.encode_png_gray(w, h, px))
    assert (dw, dh, out) == (w, h, px)


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=96000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=256
    ),
)
def test_wav_roundtrip_any_samples(rate, samples):
    out_rate, pcm = mm.decode_real_audio(mm.encode_wav(rate, samples))
    assert out_rate == rate and list(pcm) == samples


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    n_frames=st.integers(min_value=0, max_value=5),
    data=st.data(),
)
def test_y4m_roundtrip_any_frames(w, h, n_frames, data):
    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=255),
                    min_size=w * h,
                    max_size=w * h,
                )
            )
        )
        for _ in range(n_frames)
    ]
    n, dw, dh, planes = mm.decode_real_video(mm.encode_y4m(w, h, frames))
    assert (n, dw, dh) == (n_frames, w, h)
    assert planes == b"".join(frames)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_bmp_roundtrip_any_pixels(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    dw, dh, out = mm.decode_real_bmp(mm.encode_bmp(w, h, px))
    assert (dw, dh, out) == (w, h, px)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=16),
    h=st.integers(min_value=1, max_value=16),
    data=st.data(),
)
def test_gif_roundtrip_any_pixels(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    dw, dh, out = mm.decode_real_gif(mm.encode_gif_gray(w, h, px))
    assert (dw, dh, out) == (w, h, px)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    color=st.booleans(),
    restart=st.integers(min_value=0, max_value=3),
    data=st.data(),
)
def test_jpeg_roundtrip_within_one_level(w, h, color, restart, data):
    """Baseline JPEG with unit quantization: the only loss is DCT
    rounding, so every pixel round-trips within 1 intensity level —
    across grayscale/color streams and restart intervals."""
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    blob = mm.encode_baseline_jpeg_gray(w, h, px, color=color, restart_interval=restart)
    dw, dh, out = mm.decode_real_jpeg(blob)
    assert (dw, dh) == (w, h)
    assert len(out) == len(px)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1


@settings(max_examples=25, deadline=None)
@given(cut=st.integers(min_value=1, max_value=200), color=st.booleans())
def test_jpeg_truncation_never_crashes_decoder(cut, color):
    """Truncating a valid JPEG anywhere either still decodes (partial
    tail) or raises a clean exception — never an unbounded loop; the
    per-cell Exception handlers absorb whatever it raises."""
    px = bytes((x * 7 + 13) % 256 for x in range(16 * 16))
    blob = mm.encode_baseline_jpeg_gray(16, 16, px, color=color)
    truncated = blob[: max(3, len(blob) - cut)]
    try:
        dw, dh, out = mm.decode_real_jpeg(truncated)
        assert (dw, dh) == (16, 16) and len(out) == 16 * 16
    except Exception:
        pass


@settings(max_examples=60, deadline=None)
@given(
    kind=st.sampled_from(["flac", "mp3", "ogg"]),
    frac=st.floats(min_value=0.0, max_value=1.0),
    garble=st.integers(min_value=0, max_value=3),
)
def test_audio_metadata_parsers_bounded_on_corruption(kind, frac, garble):
    """Truncating or byte-flipping a valid FLAC/MP3/OGG payload either
    still parses or raises a clean exception — never hangs (every walk
    strictly advances) and never returns without its magic. The per-cell
    Exception handler in audio_container_metadata absorbs whatever these
    raise; this pins that they raise promptly."""
    blob = {
        "flac": lambda: mm.encode_minimal_flac(44100, 2, 16, 44100),
        "mp3": lambda: mm.encode_minimal_mp3(12, id3=True),
        "ogg": lambda: mm.encode_minimal_ogg_opus(2, 48000, 4800),
    }[kind]()
    cut = blob[: max(1, int(len(blob) * frac))]
    if garble and len(cut) > garble * 7:
        b = bytearray(cut)
        for g in range(garble):
            b[(g * 7919) % len(b)] ^= 0xFF
        cut = bytes(b)
    parser = {
        "flac": mm.parse_flac_metadata,
        "mp3": mm.parse_mp3_metadata,
        "ogg": mm.parse_ogg_metadata,
    }[kind]
    try:
        m = parser(cut)
        assert m["sample_rate"] is None or m["sample_rate"] >= 0
    except Exception:
        pass

@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=655350),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=300
    ),
    block=st.sampled_from([64, 192, 256]),
)
def test_flac_roundtrip_any_samples(rate, samples, block):
    """encode_flac -> decode_real_flac is lossless for any 16-bit mono
    stream at any block size (CONSTANT/FIXED+rice/VERBATIM subframes all
    reachable depending on the draw)."""
    out_rate, pcm = mm.decode_real_flac(
        mm.encode_flac(rate, samples, block_size=block)
    )
    assert out_rate == rate and list(pcm) == samples


@settings(max_examples=30, deadline=None)
@given(
    mode=st.sampled_from(["independent", "left_side", "right_side", "mid_side"]),
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-32768, max_value=32767),
            st.integers(min_value=-32768, max_value=32767),
        ),
        min_size=0,
        max_size=200,
    ),
)
def test_flac_stereo_assignments_roundtrip(mode, pairs):
    """All four channel assignments reconstruct exactly; the decode
    contract downmixes to mono (rounded mean), matching the WAV path."""
    import numpy as np

    inter = [v for p in pairs for v in p]
    expect = [int(np.round((l + r) / 2)) for l, r in pairs]
    out_rate, pcm = mm.decode_real_flac(
        mm.encode_flac(44100, inter, channels=2, block_size=96, stereo_mode=mode)
    )
    assert out_rate == 44100 and list(pcm) == expect


@settings(max_examples=60, deadline=None)
@given(
    frac=st.floats(min_value=0.0, max_value=1.0),
    garble=st.integers(min_value=0, max_value=3),
)
def test_flac_sample_decode_bounded_on_corruption(frac, garble):
    """Truncated/byte-flipped FLAC streams either decode or raise
    promptly — the sample decoder's walks all strictly advance."""
    blob = mm.encode_flac(
        8000, [int(1000 * ((i * 37) % 13 - 6)) for i in range(600)], block_size=192
    )
    cut = blob[: max(1, int(len(blob) * frac))]
    if garble and len(cut) > garble * 7:
        b = bytearray(cut)
        for g in range(garble):
            b[(g * 7919) % len(b)] ^= 0xFF
        cut = bytes(b)
    try:
        rate, pcm = mm.decode_real_flac(cut)
        assert rate > 0 and len(pcm) >= 0
    except Exception:
        pass
