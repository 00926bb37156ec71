"""Resize-kernel contracts (pure Python — no Spark needed): the bundled
nearest-neighbor BMP kernel must emit a valid re-decodable BMP with
ceil-divided dimensions, exactly the sampled source pixels, and identity
at scale=1."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from transit_efficiency_analysis_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp_gradient,
    resize_bmp_nearest,
)


def _pixel(payload: bytes, x: int, y: int) -> tuple[int, int, int]:
    w, _, _ = decode_bmp(payload)
    row = (w * 3 + 3) // 4 * 4
    o = 54 + y * row + x * 3
    return tuple(payload[o : o + 3])


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=65),
    h=st.integers(min_value=1, max_value=49),
    scale=st.integers(min_value=1, max_value=5),
)
def test_resize_dims_and_sampled_pixels(w, h, scale):
    src = encode_bmp_gradient(w, h)
    out = resize_bmp_nearest(src, scale)
    nw, nh, ch = decode_bmp(out)
    assert (nw, nh, ch) == ((w + scale - 1) // scale, (h + scale - 1) // scale, 3)
    nrow = (nw * 3 + 3) // 4 * 4
    assert len(out) == 54 + nrow * nh
    for sy in range(nh):
        for sx in range(nw):
            assert _pixel(out, sx, sy) == _pixel(src, sx * scale, sy * scale)


def test_resize_scale1_is_identity():
    src = encode_bmp_gradient(13, 7)
    assert resize_bmp_nearest(src, 1) == src


def test_gradient_sum_closed_form():
    # the SQL oracle's arithmetic: resized gradient pixel sum equals the
    # closed-form double sum over the OUTPUT grid
    src = encode_bmp_gradient(31, 22)
    out = resize_bmp_nearest(src, 2)
    nw, nh, _ = decode_bmp(out)
    expected = sum(
        3 * ((14 * sx + 26 * sy) % 256) for sx in range(nw) for sy in range(nh)
    )
    assert sum(out[54:]) == expected
