"""r8 advisor fixes: LSH budget degrade path, HALF_UP rounding parity
between the two verify plans, blocked-topk epsilon scaling."""

import warnings

import numpy as np
import pytest

from azure_airbnb_cdc_ingestion_pipeline_spark.operators.similarity import (
    _adaptive_lsh_params,
)


def test_budget_exceeded_default_still_raises():
    with pytest.raises(ValueError, match="max_tables"):
        _adaptive_lsh_params(10_000_000, 8, 4)


def test_budget_exceeded_degrade_falls_back_with_warning():
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        p, t, nb = _adaptive_lsh_params(
            10_000_000, 8, 4, on_budget_exceeded="degrade"
        )
    assert any("best-effort" in str(w.message) for w in caught)
    # fell back to the near-dup sizing: same tables as an explicit
    # recall_at=0.999 call at the same n
    p2, t2, nb2 = _adaptive_lsh_params(10_000_000, 8, 4, recall_at=0.999)
    assert (p, t, nb) == (p2, t2, nb2)
    assert t <= 160


def test_degrade_inert_inside_budget():
    # inside the envelope the degrade flag changes nothing
    assert _adaptive_lsh_params(
        100, 8, 4, on_budget_exceeded="degrade"
    ) == _adaptive_lsh_params(100, 8, 4)
    assert _adaptive_lsh_params(
        2_000_000, 8, 4, on_budget_exceeded="degrade"
    ) == _adaptive_lsh_params(2_000_000, 8, 4)


def test_half_up_rounding_matches_spark_round():
    """The broadcast verify path's sign-aware floor(x*1e4+0.5) must
    equal Spark/DuckDB HALF_UP at exact 5e-5 boundaries, where
    np.round's half-to-even used to diverge."""
    xs = np.array([0.95005, 0.95015, -0.95005, 0.12345, 0.9999499999,
                   0.0, 1.0, -1.0, 0.94995])
    ours = np.sign(xs) * np.floor(np.abs(xs) * 1e4 + 0.5) / 1e4
    import decimal

    def half_up(v):
        return float(
            decimal.Decimal(repr(v)).quantize(
                decimal.Decimal("0.0001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    expect = np.array([half_up(float(v)) for v in xs])
    assert np.allclose(ours, expect, atol=0, rtol=0)
