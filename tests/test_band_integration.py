"""Full destripe_batch through the PRODUCTION Pallas kernel graph, executed
in interpreter mode on the CPU backend (DESTRIPE_PALLAS_INTERPRET=1,
ops/pallas_env.py), compared against the dense XLA formulation
(DESTRIPE_NO_PALLAS=1).

This is the CI-side twin of the on-TPU bench gate: it exercises the actual
wiring in ops/filter.py — banded analysis with classifier/Otsu stats side
channels, fused notch->delta, banded synthesis with the exp + flat-field /
wrap epilogues — not just the kernels in isolation. The two paths differ
only by bf16x3 matmul accumulation (== lax.Precision.HIGH) vs CPU f32, so
they must agree to PSNR >= 60 dB (the project's golden gate; measured
85-103 dB on hardware)."""

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    build_plan,
    destripe_batch,
)
from aind_smartspim_destripe_tpu.ops.flatfield import flatfield_correction

H, W, B = 640, 768, 3


def _planes():
    rng = np.random.default_rng(0)
    level = np.array([300.0, 3200.0, 500.0])[:, None, None]
    return np.clip(
        level
        + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(B, H, W)) * 10,
        0,
        65535,
    ).astype(np.uint16)


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))
                  ** 2)
    return np.inf if mse == 0 else 10 * np.log10(65535.0**2 / mse)


@pytest.fixture(scope="module")
def plan():
    return build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )


@pytest.fixture(scope="module")
def dense_out(plan):
    """Dense-path float output and consts, computed with Pallas disabled."""
    import os

    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        consts = plan.constants()
        assert "band0" not in consts and "notch_sel" not in consts
        out = np.asarray(
            destripe_batch(plan, _planes(), 2500.0, consts)
        )
    finally:
        del os.environ["DESTRIPE_NO_PALLAS"]
    return out


def _pallas_consts(plan, monkeypatch):
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    consts = plan.constants()
    assert "band0" in consts, "interpret override must enable the band path"
    assert any(n is not None for n in consts["notch_sel"])
    return consts


def test_band_graph_matches_dense(plan, dense_out, monkeypatch):
    consts = _pallas_consts(plan, monkeypatch)
    got = np.asarray(destripe_batch(plan, _planes(), 2500.0, consts))
    assert got.shape == dense_out.shape and got.dtype == np.float32
    psnr = _psnr(got, dense_out)
    assert psnr >= 60.0, f"band-vs-dense PSNR {psnr:.1f} dB < 60"


def test_band_graph_flat_epilogue(plan, dense_out, monkeypatch):
    consts = _pallas_consts(plan, monkeypatch)
    flat = np.full((H, W), 1.2, np.float32)
    dark = np.full((H, W), 4.0, np.float32)
    got = np.asarray(
        destripe_batch(plan, _planes(), 2500.0, consts, flat=flat,
                       dark=dark)
    )
    want = np.asarray(flatfield_correction(dense_out, flat, dark))
    assert got.dtype == np.uint16
    psnr = _psnr(got, want)
    assert psnr >= 60.0, f"flat-epilogue PSNR {psnr:.1f} dB < 60"


def test_band_graph_odd_geometry(monkeypatch):
    """Ragged everything: odd height/width exercise every boundary-masking
    path (lane/sublane padding, partial stores, clamped window starts)."""
    import os

    h, w = 801, 701  # odd, above the band gate (>=560 per side, >=400k px)
    plan2 = build_plan(
        h, w,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    rng = np.random.default_rng(3)
    x = np.clip(
        400
        + (rng.normal(size=(2, h, 1)) * 60) * np.ones((1, 1, w))
        + rng.normal(size=(2, h, w)) * 10,
        0, 65535,
    ).astype(np.uint16)

    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        dense = np.asarray(
            destripe_batch(plan2, x, 2500.0, plan2.constants())
        )
    finally:
        del os.environ["DESTRIPE_NO_PALLAS"]

    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    consts = plan2.constants()
    assert "band0" in consts
    got = np.asarray(destripe_batch(plan2, x, 2500.0, consts))
    psnr = _psnr(got, dense)
    assert psnr >= 60.0, f"odd-geometry PSNR {psnr:.1f} dB < 60"


def test_band_graph_dual_mode(monkeypatch):
    """dual=True through the interpreted Pallas graph: exercises the
    wrapped input block indexing (notch_delta reads each band once for two
    output variants; syn_x_exp reads the raw planes once for two
    corrections) against the dense dual formulation."""
    import os

    plan_d = build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=256, max_threshold=12),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    x = _planes()

    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        dense = np.asarray(
            destripe_batch(plan_d, x, -np.inf, plan_d.constants(), dual=True)
        )
    finally:
        del os.environ["DESTRIPE_NO_PALLAS"]

    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    consts = plan_d.constants()
    assert "band0" in consts
    got = np.asarray(
        destripe_batch(plan_d, x, -np.inf, consts, dual=True)
    )
    assert got.shape == (2 * B, H, W)
    psnr = _psnr(got, dense)
    assert psnr >= 60.0, f"dual-mode PSNR {psnr:.1f} dB < 60"
    # the two bands must differ (sigma 256 vs 128)
    assert np.abs(got[:B] - got[B:]).max() > 0.1


def test_band_graph_wrap_epilogue(plan, dense_out, monkeypatch):
    consts = _pallas_consts(plan, monkeypatch)
    got = np.asarray(
        destripe_batch(plan, _planes(), 2500.0, consts, wrap=True)
    )
    want = (
        np.mod(np.trunc(dense_out).astype(np.int64), 65536)
    ).astype(np.uint16)
    assert got.dtype == np.uint16
    psnr = _psnr(got, want)
    assert psnr >= 60.0, f"wrap-epilogue PSNR {psnr:.1f} dB < 60"
