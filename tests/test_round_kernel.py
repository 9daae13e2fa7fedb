"""Bit-for-bit validation of the vectorized harness rounding kernel.

``_round_vals`` (``__ray_entry__.py``) is the oracle-comparison rounding
used on every float score column in the sweep harness; it must equal the
Decimal half-up quantize reference (= DuckDB ``round()``) EXACTLY —
including on adversarial half-boundary values where the vectorized float
product could misdecide — or value-hash comparisons silently diverge.
Pure numpy/Decimal: no Ray session needed.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pytest


def _decimal_ref(vals: np.ndarray, nudge: float = 0.0) -> list[float]:
    quant = Decimal(1).scaleb(-6)
    return [
        float(Decimal(float(v) + nudge).quantize(quant,
                                                 rounding=ROUND_HALF_UP))
        for v in vals
    ]


def _kernel(vals: np.ndarray, nudge: float = 0.0) -> np.ndarray:
    import __ray_entry__ as e

    return e._round_vals(np.asarray(vals, dtype=np.float64), nudge)


def _assert_bitwise_equal(vals: np.ndarray, nudge: float = 0.0) -> None:
    got = _kernel(vals, nudge)
    want = _decimal_ref(vals, nudge)
    for v, g, w in zip(vals, got, want):
        assert math.copysign(1.0, g) == math.copysign(1.0, w) and g == w, (
            repr(float(v)), g, w)


def test_round_vals_adversarial_half_boundaries():
    # exact decimal half boundaries at 1e-7 (ties), their float
    # neighbours one ulp either side, and signed variants
    base = []
    for mant in (5, 15, 25, 1234565, 9999995, 4999995):
        for exp in (-7, -6, -5):
            t = mant * (10.0 ** exp)
            base.extend([t, np.nextafter(t, 0.0), np.nextafter(t, np.inf)])
    vals = np.array(base + [-v for v in base] + [0.0, -0.0, 1e-300,
                                                 -1e-300, 123456.4999995,
                                                 1e12 + 0.5e-6],
                    dtype=np.float64)
    _assert_bitwise_equal(vals)
    _assert_bitwise_equal(vals, nudge=1e-9)


def test_round_vals_random_bulk():
    rng = np.random.default_rng(1234)
    vals = np.concatenate([
        rng.uniform(-1, 1, 20_000),
        rng.uniform(-1e6, 1e6, 20_000),
        rng.normal(0, 1e-6, 20_000),
        # values constructed to sit AT representable points near ties
        np.round(rng.uniform(-100, 100, 20_000), 7),
    ])
    _assert_bitwise_equal(vals)
    _assert_bitwise_equal(vals, nudge=1e-9)


def test_round_arr_preserves_nulls():
    import __ray_entry__ as e

    arr = pa.array([1.2345675, None, -0.25, None], type=pa.float64())
    out = e._round_arr(arr)
    assert out.null_count == 2
    assert out[1].as_py() is None and out[3].as_py() is None
    assert out[0].as_py() == _decimal_ref(np.array([1.2345675]))[0]
    assert out[2].as_py() == -0.25


def test_round_vals_nonfinite_matches_decimal():
    # Decimal quantize of a quiet NaN returns NaN silently; of an
    # infinity it raises InvalidOperation — the kernel's non-finite
    # fallback must reproduce both (not silently zero or propagate)
    out = _kernel(np.array([1.0, float("nan")]))
    assert out[0] == 1.0 and math.isnan(out[1])
    from decimal import InvalidOperation

    with pytest.raises(InvalidOperation):
        _kernel(np.array([float("inf")]))
