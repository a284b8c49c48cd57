"""
Per-shard Pallas tier of the Y-halo route (parallel/halo.py, round 5):
blocked banded x-kernels (K1/K4, chunked for scoped VMEM), psum'd Otsu
histograms, and row-local masked medians run INSIDE shard_map on each row
shard — executed here in interpreter mode on the 8-virtual-device CPU mesh
(DESTRIPE_PALLAS_INTERPRET=1) and gated against the dense-XLA halo tier
(DESTRIPE_HALO_PALLAS=0), the same cross-formulation tolerance the
plane-path interpret gates use (bf16x3 == Precision.HIGH vs CPU f32 dense:
PSNR >= 60 dB golden gate, almost-everywhere <= 1 uint16 LSB).

Reference semantics: filtering.py:139-224 at beyond-HBM plane sizes
(SURVEY §5 sequence-parallel analog).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops.filter import FilterConfig, build_plan
from aind_smartspim_destripe_tpu.parallel.halo import (
    _otsu_sharded,
    _median_sharded,
    _plan_x_blocks,
    destripe_y_sharded,
    dual_band_destripe_y_sharded,
    halo_constants,
)
from aind_smartspim_destripe_tpu.parallel.mesh import make_mesh

H, W = 320, 640  # wide enough for the K1/K4 window formulas (>= 560) and
# the finest band (162x322 = 52 kpx) above the Pallas pay-off gate


def _mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_mesh(len(jax.devices()), axis="z")


def _mixed_batch():
    """A dim striped background plane and a bright cells-like plane (both
    classifier branches)."""
    rng = np.random.default_rng(7)
    stripes = (rng.normal(size=(1, H, 1)) * 50) * np.ones((1, 1, W))
    dim = 300 + stripes[0]
    bright = 3000 + stripes[0] + rng.normal(size=(H, W)) * 40
    return np.clip(np.stack([dim, bright]), 0, 65535).astype(np.uint16)


def _plan():
    return build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )


def _gate_u16(got, want, psnr_min=80.0, flip_budget=0.1):
    """Cross-FORMULATION gate (same form as the plane path's interpret
    gates, test_band_integration.py): the Pallas tier's bf16x3 matmuls
    (== Precision.HIGH) vs the dense tier's CPU f32 shift coefficients at
    ~1e-7 rel, which flips borderline stripe-mask compares and Otsu bins
    into scattered few-LSB pixels on bright planes (measured here: dim
    plane <= 1 LSB everywhere, bright plane 95.8 dB). Bitwise/<=1-LSB
    budgets only apply between SAME-formulation runs."""
    d = got.astype(np.int64) - want.astype(np.int64)
    assert float((np.abs(d) > 1).mean()) < flip_budget, (
        f"flips {(np.abs(d) > 1).mean():.2e}"
    )
    mse = float((d.astype(np.float64) ** 2).mean())
    psnr = 10 * np.log10(65535.0**2 / max(mse, 1e-12))
    assert psnr >= psnr_min, f"PSNR {psnr:.1f} dB"
    return psnr


def test_x_blocks_planned_for_wide_levels():
    plan = _plan()
    (a1, a4), (s1, s4) = _plan_x_blocks(plan)
    # level 0 (640 wide) must be blockable on both passes; deeper levels
    # (<560) fall back to the dense einsum by design
    assert 0 in a1 and 0 in s1
    assert (plan.n_levels - 1) in a4 and (plan.n_levels - 1) in s4
    bh, bl = a1[0]
    assert bh.shape == bl.shape and bh.shape[0] == -(-((W + 5) // 2) // 128)


def test_halo_pallas_tier_matches_dense(monkeypatch):
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    plan = _plan()
    img = _mixed_batch()
    harrs, hstatic = halo_constants(plan, mesh.shape["z"])
    assert "xk1" in hstatic and 0 in hstatic["xk1"], "pallas tier inactive"
    got = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic, wrap=True,
    ))
    monkeypatch.setenv("DESTRIPE_HALO_PALLAS", "0")
    want = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic, wrap=True,
    ))
    assert got.dtype == np.uint16 and got.shape == img.shape
    _gate_u16(got, want)


def test_halo_pallas_flat_epilogue_matches_dense(monkeypatch):
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    plan = _plan()
    img = _mixed_batch()
    rng = np.random.default_rng(3)
    flat = (1.0 + 0.2 * rng.random((H, W))).astype(np.float32)
    dark = np.full((H, W), 4.0, np.float32)
    harrs, hstatic = halo_constants(plan, mesh.shape["z"])
    got = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic,
        flat=flat, dark=dark,
    ))
    monkeypatch.setenv("DESTRIPE_HALO_PALLAS", "0")
    want = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic,
        flat=flat, dark=dark,
    ))
    assert got.dtype == np.uint16
    _gate_u16(got, want)


def test_halo_pallas_dual_matches_dense(monkeypatch):
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    plan = _plan()
    img = _mixed_batch()
    harrs, hstatic = halo_constants(plan, mesh.shape["z"])
    got = np.asarray(dual_band_destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic, wrap=True,
    ))
    monkeypatch.setenv("DESTRIPE_HALO_PALLAS", "0")
    want = np.asarray(dual_band_destripe_y_sharded(
        jnp.asarray(img), mesh, plan, None, harrs, hstatic, wrap=True,
    ))
    assert got.dtype == np.uint16 and got.shape == img.shape
    _gate_u16(got, want)


def test_halo_pallas_ragged_rows(monkeypatch):
    """Row counts that don't divide the mesh exercise the pad->crop path of
    every sharded kernel (K1/K4 pad rows, the Otsu dynamic row bound, the
    median crop)."""
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(5)
    h_odd = 310  # 310 % 8 != 0
    img = np.clip(
        300 + (rng.normal(size=(1, h_odd, 1)) * 50) * np.ones((1, 1, W))
        + rng.normal(size=(1, h_odd, W)) * 10, 0, 65535,
    ).astype(np.uint16)
    plan = build_plan(
        h_odd, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    got = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, wrap=True,
    ))
    monkeypatch.setenv("DESTRIPE_HALO_PALLAS", "0")
    want = np.asarray(destripe_y_sharded(
        jnp.asarray(img), mesh, plan, wrap=True,
    ))
    _gate_u16(got, want)


def test_production_halo_step_pallas_tier(monkeypatch):
    """The PRODUCTION halo step (make_device_step above the byte threshold)
    takes the Pallas tier, including the consts post-filter that drops the
    dense x operators superseded by the blocked K1/K4 (runtime/pipeline.py)
    — and its kill-switch twin (which then runs the banded/spectral x
    fallback) agrees to the cross-formulation gate."""
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DESTRIPE_HALO_THRESHOLD_BYTES", "1024")
    from aind_smartspim_destripe_tpu.runtime.pipeline import make_device_step

    plan = _plan()
    img = _mixed_batch()
    flat = np.full((H, W), 1.2, np.float32)
    dark = np.full((H, W), 4.0, np.float32)
    step = make_device_step(plan, 2500.0, True, devices=jax.devices())
    assert getattr(step, "shards_rows", False), "halo route not selected"
    got = np.asarray(step(
        step.put(img), step.put_const(flat), step.put_const(dark)
    ))
    monkeypatch.setenv("DESTRIPE_HALO_PALLAS", "0")
    step2 = make_device_step(plan, 2500.0, True, devices=jax.devices())
    want = np.asarray(step2(
        step2.put(img), step2.put_const(flat), step2.put_const(dark)
    ))
    assert got.dtype == np.uint16 and got.shape == img.shape
    _gate_u16(got, want)


def test_chunked_k1_bitexact(monkeypatch):
    """Operator column chunking changes only store grouping: the chunked
    analysis x-pass must equal the single-call kernel BIT-FOR-BIT."""
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    from aind_smartspim_destripe_tpu.ops import pallas_band as PB

    plan = _plan()
    (a1, _), (s1, _) = _plan_x_blocks(plan)
    blocks, meta = a1[0], s1[0]
    rng = np.random.default_rng(11)
    x_u16 = rng.integers(0, 4000, size=(2, 64, W)).astype(np.uint16)
    for x in (x_u16, np.log1p(x_u16.astype(np.float32))):
        log1p = x.dtype == np.uint16
        base = np.asarray(PB.an_x_lowpass_log1p(
            jnp.asarray(x), tuple(map(jnp.asarray, blocks)),
            meta["starts"], meta["out_w"], log1p=log1p,
        ))
        chunked = np.asarray(PB.an_x_lowpass_chunked(
            jnp.asarray(x), tuple(map(jnp.asarray, blocks)),
            meta["starts"], meta["out_w"], log1p=log1p, budget=330_000,
        ))
        np.testing.assert_array_equal(base, chunked)


def test_chunked_k4_bitexact(monkeypatch):
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    from aind_smartspim_destripe_tpu.ops import pallas_band as PB

    plan = _plan()
    (_, a4), (_, s4) = _plan_x_blocks(plan)
    i = plan.n_levels - 1
    blocks, meta = a4[i], s4[i]
    L_x = plan.ladder[i][1]
    rng = np.random.default_rng(13)
    stacked = (rng.normal(size=(2, 64, L_x)) * 0.1).astype(np.float32)
    imgs = rng.integers(0, 4000, size=(2, 64, W)).astype(np.uint16)
    flat = (1.0 + 0.1 * rng.random((64, W))).astype(np.float32)
    dark = np.full((64, W), 2.0, np.float32)
    cases = [
        dict(images=None),
        dict(images=jnp.asarray(imgs)),
        dict(images=jnp.asarray(imgs), wrap=True),
        dict(images=jnp.asarray(imgs), flat=jnp.asarray(flat),
             dark=jnp.asarray(dark)),
    ]
    for kw in cases:
        base = np.asarray(PB.syn_x_exp(
            jnp.asarray(stacked), kw.get("images"),
            tuple(map(jnp.asarray, blocks)), meta["starts"], meta["out_w"],
            flat=kw.get("flat"), dark=kw.get("dark"),
            wrap=kw.get("wrap", False),
        ))
        chunked = np.asarray(PB.syn_x_exp_chunked(
            jnp.asarray(stacked), kw.get("images"),
            tuple(map(jnp.asarray, blocks)), meta["starts"], meta["out_w"],
            flat=kw.get("flat"), dark=kw.get("dark"),
            wrap=kw.get("wrap", False), budget=700_000,
        ))
        np.testing.assert_array_equal(base, chunked)


def test_otsu_sharded_exact(monkeypatch):
    """psum'd shard-local Pallas histograms reproduce the unsharded Otsu
    EXACTLY (binning identical, counts exact below 2^24), including with
    pad rows excluded by the dynamic row bound (70 rows on 8 devices)."""
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    from aind_smartspim_destripe_tpu.ops.otsu import threshold_otsu_batch

    rng = np.random.default_rng(17)
    ch = (rng.normal(size=(3, 70, 200)) * 5).astype(np.float32)
    got_sq = np.asarray(_otsu_sharded(jnp.asarray(ch), mesh, "z",
                                      square=True))
    want_sq = np.asarray(threshold_otsu_batch(
        jnp.asarray(ch) * jnp.asarray(ch), pallas=False))
    np.testing.assert_array_equal(got_sq, want_sq)
    got = np.asarray(_otsu_sharded(jnp.asarray(ch), mesh, "z",
                                   square=False))
    want = np.asarray(threshold_otsu_batch(jnp.asarray(ch), pallas=False))
    np.testing.assert_array_equal(got, want)


def test_median_sharded_exact(monkeypatch):
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    from aind_smartspim_destripe_tpu.ops.pallas_median import (
        row_median_masked,
    )

    rng = np.random.default_rng(19)
    ch = (rng.normal(size=(2, 70, 322)) * 3).astype(np.float32)
    thr = np.array([1.0, 2.5], np.float32)
    got = np.asarray(_median_sharded(jnp.asarray(ch), jnp.asarray(thr),
                                     mesh, "z"))
    want = np.asarray(row_median_masked(jnp.asarray(ch), jnp.asarray(thr)))
    np.testing.assert_array_equal(got, want)


def test_notch_banks_planned_and_used():
    """halo_constants builds the stacked per-plane-selectable notch banks
    for levels above the Pallas pay-off gate (and only there), and the
    dual-mode builder contract (notch_blocks=False) drops the group."""
    os.environ["DESTRIPE_PALLAS_INTERPRET"] = "1"
    try:
        plan = _plan()
        harrs, hstatic = halo_constants(plan, 4)
        fin = plan.n_levels - 1  # finest band 162x322 = 52 kpx > gate
        assert "notch" in hstatic and fin in hstatic["notch"]
        hi, lo = harrs["notch"][str(fin)]
        wp = -(-plan.ladder[fin][1] // 128) * 128
        assert hi.shape == (2, wp, wp) and lo.shape == (2, wp, wp)
        # coarser levels sit below the pay-off gate: no banks built
        assert 0 not in hstatic["notch"]
        _, h2 = halo_constants(plan, 4, notch_blocks=False)
        assert "notch" not in h2
    finally:
        os.environ.pop("DESTRIPE_PALLAS_INTERPRET", None)


def test_notch_sharded_matches_dense(monkeypatch):
    """Row-sharded chunked per-plane notch product == the per-plane dense
    matmul, on ragged rows (162 % 8 != 0 exercises the pad->crop path)."""
    mesh = _mesh()
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    from aind_smartspim_destripe_tpu.ops import fft_notch
    from aind_smartspim_destripe_tpu.ops import pallas_notch as pn
    from aind_smartspim_destripe_tpu.parallel.halo import _notch_sharded

    rng = np.random.default_rng(11)
    B, h, w = 2, 162, 322
    ch = (rng.normal(size=(B, h, w)) * 3.0).astype(np.float32)
    bc = fft_notch.packed_notch_matrix(w, 12.0).astype(np.float32)
    bn = fft_notch.packed_notch_matrix(w, 40.0).astype(np.float32)
    sel = np.array([0, 1], np.int32)
    blocks = pn.stacked_notch_operators(bc, bn)
    got = np.asarray(_notch_sharded(
        jnp.asarray(ch), jnp.asarray(sel), blocks, mesh, "z"
    ))
    want = np.stack([
        ch[b].astype(np.float64)
        @ (bc if sel[b] == 0 else bn).astype(np.float64).T
        for b in range(B)
    ])
    assert got.shape == ch.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
