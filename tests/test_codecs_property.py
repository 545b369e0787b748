"""Property-based round-trip tests for the pure-numpy media codecs
(WAV/PCM16, PNG, Y4M) — no SparkSession needed: the codecs are plain
functions; the Spark mapInPandas plumbing is covered in test_pipeline.
Hypothesis drives shapes/values; every generated payload must survive
encode -> decode bit-exactly."""

import numpy as np
from hypothesis import given, settings, strategies as st

from linkgraph.pipeline.multimodal import (
    decode_png,
    decode_wav_pcm16,
    decode_y4m,
    encode_png,
    encode_wav_pcm16,
    encode_y4m,
)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=4096),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_round_trip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    got, got_rate, ch = decode_wav_pcm16(encode_wav_pcm16(s, rate))
    assert got_rate == rate and ch == 1
    assert np.array_equal(got, s)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_round_trip_property(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    got = decode_png(encode_png(arr if ch > 1 else arr[:, :, 0]))
    assert got.shape == (h, w, ch)
    assert np.array_equal(got, arr)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=6),
    h=st.integers(min_value=1, max_value=16),
    w=st.integers(min_value=1, max_value=16),
    mono=st.booleans(),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_round_trip_property(n, h, w, mono, seed):
    rng = np.random.default_rng(seed)
    shape = (n, h, w) if mono else (n, h, w, 3)
    frames = rng.integers(0, 256, size=shape, dtype=np.uint8)
    cs = "Cmono" if mono else "C444"
    got, got_n, wh = decode_y4m(encode_y4m(frames, colorspace=cs))
    assert got_n == n and wh == (w, h)
    assert got.shape == shape
    assert np.array_equal(got, frames)
