"""Hypothesis fuzzing for the real multimodal decoders: arbitrary or
truncated payloads must fail with a CLEAR ValueError (never an opaque
numpy reshape error or an out-of-bounds read), and spec-valid payloads
must round-trip.  Pure-python kernels — no Spark jobs, so the fuzz
budget is cheap."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafkaish_spark.operators.multimodal import decode_ppm, make_ppm


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=512))
def test_decode_ppm_arbitrary_bytes_never_crash_opaquely(payload):
    try:
        img = decode_ppm(payload)
    except ValueError:
        return  # the documented failure mode
    # if it parsed, the result must be structurally sound
    h, w, c = img.shape
    assert c == 3 and h >= 1 and w >= 1


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**31 - 1),
    st.binary(min_size=4, max_size=64),
)
def test_make_ppm_roundtrips_through_decode(doc_id, seed):
    payload = make_ppm(doc_id, seed)
    img = decode_ppm(payload)
    w = 16 + seed[0] % 48
    h = 16 + seed[1] % 48
    assert img.shape == (h, w, 3)
    # pixel bytes are exactly the synthesized body
    body = (seed * (w * h * 3 // len(seed) + 1))[: w * h * 3]
    assert img.tobytes() == body


@settings(max_examples=50, deadline=None)
@given(
    st.binary(min_size=4, max_size=64),
    st.integers(min_value=1, max_value=200),
)
def test_decode_ppm_truncation_is_a_clear_error(seed, cut):
    payload = make_ppm(7, seed)
    truncated = payload[:-cut] if cut < len(payload) else b"P6"
    with pytest.raises(ValueError):
        decode_ppm(truncated)
