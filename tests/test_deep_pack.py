"""Packed deep-level filter tail (ops/filter._filter_deep_tail): the batched
coarse-level path must match the per-level reference formulation.

The pack reorganizes reductions (masked Otsu over lane-padded rows, one
sort for every level's row medians, zero-padded notch contractions), so the
comparison allows ulp-level regrouping noise but nothing structural."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from aind_smartspim_destripe_tpu.ops import filter as flt
from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    build_plan,
    destripe_batch,
)

H, W = 220, 300  # 5 wavelet levels, ALL below the Pallas gate -> all packed


def _plan():
    return build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )


def _planes(b=3):
    rng = np.random.default_rng(42)
    level = np.array([300.0, 3200.0, 500.0])[:b, None, None]
    return np.clip(
        level
        + (rng.normal(size=(b, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(b, H, W)) * 10,
        0,
        65535,
    ).astype(np.uint16)


def _psnr(a, b):
    mse = np.mean(
        (np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2
    )
    return np.inf if mse == 0 else 10 * np.log10(65535.0**2 / mse)


@pytest.fixture(autouse=True)
def _force_pack_on(monkeypatch):
    """Pin the pack ON regardless of the module default, so these gates test
    the packed path even if _DEEP_PACK ships default-off."""
    monkeypatch.setattr(flt, "_DEEP_PACK", True)


def test_deep_constants_present():
    consts = _plan().constants()
    assert "deep" in consts
    deep = consts["deep"]
    n = len(deep["bmat"])
    assert n == 5
    assert deep["onehot"].shape[0] == n
    # rows cover every packed level exactly once
    assert (deep["onehot"].sum(axis=0) == 1.0).all()
    # median order statistics stay inside each row's valid width
    widths = deep["lane_valid"].sum(axis=1)
    assert (deep["med_hi"] < widths).all()
    assert (deep["med_lo"] == (widths - 1) // 2).all()


def test_deep_otsu_matches_per_level():
    """The packed masked Otsu must equal threshold_otsu_batch(square=True)
    BIT-EXACTLY per level: binning, bin centers, and cumulative moments all
    reassociate only over exact operations (integer counts in f32, /256
    power-of-two scaling), so any difference is a real regression."""
    from aind_smartspim_destripe_tpu.ops.otsu import threshold_otsu_batch

    plan = _plan()
    deep = plan.constants()["deep"]
    n = len(deep["bmat"])
    ladder = plan.ladder[:n]
    w0 = ladder[-1][1]
    rng = np.random.default_rng(7)
    # arbitrary band-shaped data (the gate is about the Otsu math, not the
    # wavelet transform); mixed scales stress per-level bin ranges
    chs_rev = [
        jnp.asarray(
            rng.normal(scale=10.0 ** (lvl - 2), size=(3, h, w))
        ).astype(jnp.float32)
        for lvl, (h, w) in enumerate(ladder)
    ]
    packed = jnp.concatenate(
        [
            jnp.pad(c, ((0, 0), (0, 0), (0, w0 - c.shape[-1])))
            for c in chs_rev
        ],
        axis=1,
    )
    got = np.asarray(flt._deep_tail_otsu(ladder, packed, deep))  # (B, L)
    for lvl in range(n):
        want = np.sqrt(
            np.asarray(
                threshold_otsu_batch(chs_rev[lvl], square=True, pallas=False)
            )
        )
        np.testing.assert_array_equal(
            got[:, lvl], want, err_msg=f"level {lvl}"
        )


def test_packed_matches_per_level(monkeypatch):
    plan = _plan()
    x = _planes()
    consts = plan.constants()
    got = np.asarray(destripe_batch(plan, x, 2500.0, consts))
    monkeypatch.setattr(flt, "_DEEP_PACK", False)
    want = np.asarray(destripe_batch(plan, x, 2500.0, consts))
    psnr = _psnr(got, want)
    assert psnr >= 110.0, f"pack-vs-per-level PSNR {psnr:.1f} dB"
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=0.05)


def test_packed_matches_per_level_dual(monkeypatch):
    plan = _plan()
    x = _planes(2)
    consts = plan.constants()
    got = np.asarray(destripe_batch(plan, x, 2500.0, consts, dual=True))
    monkeypatch.setattr(flt, "_DEEP_PACK", False)
    want = np.asarray(destripe_batch(plan, x, 2500.0, consts, dual=True))
    assert got.shape == (4, H, W)
    psnr = _psnr(got, want)
    assert psnr >= 110.0, f"dual pack-vs-per-level PSNR {psnr:.1f} dB"


def test_packed_partial_prefix():
    """A geometry whose finest level exceeds the gate packs only the coarse
    prefix; output still matches the unpacked path."""
    h, w = 640, 768  # finest level 322x386 >= gate -> packed prefix only
    plan = build_plan(
        h, w,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    consts = plan.constants()
    assert "deep" in consts
    assert len(consts["deep"]["bmat"]) < plan.n_levels
    rng = np.random.default_rng(1)
    x = np.clip(
        400 + rng.normal(size=(2, h, w)) * 40, 0, 65535
    ).astype(np.uint16)
    got = np.asarray(destripe_batch(plan, x, 2500.0, consts))
    flt._DEEP_PACK = False
    try:
        want = np.asarray(destripe_batch(plan, x, 2500.0, consts))
    finally:
        flt._DEEP_PACK = True
    psnr = _psnr(got, want)
    assert psnr >= 110.0, f"prefix pack PSNR {psnr:.1f} dB"
