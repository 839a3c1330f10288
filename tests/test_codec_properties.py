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
