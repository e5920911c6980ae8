"""The parity checker must be exactly as strict as the driver's value
hash — bit-pattern float equality. r3 shipped two driver hash-fails
(dedup_embed_cosine/lsh, a rounded -0.0) that the local harness could not
see because it compared floats with ==; these tests pin the fixed
sensitivity so the class stays dead."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from tests.parity import assert_frames_match, float_bits_equal


def test_signed_zero_distinguished():
    assert not float_bits_equal(0.0, -0.0)
    assert not float_bits_equal(-0.0, 0.0)
    assert float_bits_equal(0.0, 0.0)
    assert float_bits_equal(-0.0, -0.0)


def test_nan_equal_but_values_bitwise():
    assert float_bits_equal(float("nan"), float("nan"))
    assert float_bits_equal(1.5, 1.5)
    assert not float_bits_equal(1.5, 1.5 + 1e-12)
    assert not float_bits_equal(math.inf, -math.inf)


def test_frames_match_rejects_signed_zero_mismatch():
    a = pd.DataFrame({"k": [1, 2], "v": [0.5, 0.0]})
    b = pd.DataFrame({"k": [1, 2], "v": [0.5, -0.0]})
    with pytest.raises(AssertionError, match="v"):
        assert_frames_match(a, b, "signed_zero")


def test_frames_match_accepts_equal_frames_out_of_order():
    a = pd.DataFrame({"k": [2, 1], "v": [0.0, 0.5]})
    b = pd.DataFrame({"k": [1, 2], "v": [0.5, 0.0]})
    assert_frames_match(a, b, "reordered")
