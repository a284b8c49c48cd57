"""Dual-band wavelet-FFT variant tests (BASELINE config 2)."""

import numpy as np

from aind_smartspim_destripe_tpu.ops.dual_band import dual_band_filtering
from tests.test_filter_golden import synthetic_plane


def test_dual_band_removes_stripes_preserves_bright():
    rng = np.random.default_rng(0)
    h, w = 96, 128
    base = 300 + 2.0 * np.arange(w)[None, :] * np.ones((h, 1))
    img = base + (rng.normal(size=(h, 1)) * 100.0) * np.ones((1, w))
    # bright blob that the foreground band should protect
    yy, xx = np.mgrid[0:h, 0:w]
    img = img + 20000 * np.exp(-((yy - 40) ** 2 + (xx - 60) ** 2) / 16.0)
    img = np.clip(img, 0, 65535).astype(np.float32)

    out = dual_band_filtering(
        img, sigma=(256.0, 64.0), wavelet="db3", level=None,
        max_threshold=12.0, crossover=100.0,
    )
    assert out.shape == img.shape
    # background stripes attenuated
    bg_rows_before = np.var(img[:, :30].mean(axis=1))
    bg_rows_after = np.var(out[:, :30].mean(axis=1))
    assert bg_rows_after < bg_rows_before / 2
    # bright peak survives within 10%
    assert out[40, 60] > 0.9 * img[40, 60]


def test_dual_band_batch_and_fixed_threshold():
    imgs = np.stack([synthetic_plane(64, 80, seed=s) for s in range(2)])
    out = dual_band_filtering(imgs, sigma=(128.0, 32.0), threshold=500.0)
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()


import pytest


@pytest.mark.parametrize(
    "h,w",
    [
        (96, 128),  # lane-aligned
        (130, 258),  # odd extents, non-multiple-of-8 rows
        (67, 310),  # tall-narrow wavelet ladder, ragged last level
    ],
)
def test_dual_shared_decomposition_matches_two_single_runs(h, w):
    """destripe_batch(dual=True) — one analysis, two notch/synthesis bands —
    must reproduce two independent single-band runs (up to f32 batch-extent
    vectorization jitter; the algorithms are identical per plane). Odd
    geometries exercise the wrapped dual block indexing at ragged ladders."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig,
        build_plan,
        destripe_batch,
    )

    imgs = np.stack(
        [synthetic_plane(h, w, seed=s) for s in range(3)]
    ).astype(np.float32)
    cfg_f = FilterConfig("db3", None, 256.0, 12.0)
    cfg_b = FilterConfig("db3", None, 128.0, 12.0)
    plan_dual = build_plan(h, w, cfg_f, cfg_b)
    both = np.asarray(
        destripe_batch(plan_dual, jnp.asarray(imgs), -np.inf, dual=True)
    )
    assert both.shape == (6, h, w)
    for cfg, half in ((cfg_f, both[:3]), (cfg_b, both[3:])):
        plan = build_plan(h, w, cfg, cfg)
        single = np.asarray(destripe_batch(plan, jnp.asarray(imgs), -np.inf))
        np.testing.assert_allclose(half, single, rtol=0, atol=2e-3)
    # the two bands genuinely differ (different sigmas)
    assert np.abs(both[:3] - both[3:]).max() > 0.1


def test_pallas_blend_matches_xla_chain():
    """Fused blend kernel (ops/pallas_blend.py) vs the XLA sigmoid ->
    box-smooth -> mix chain, at a geometry with ragged row tiles (H not a
    multiple of rows_tile) and a non-128 lane width."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops import pallas_blend
    from aind_smartspim_destripe_tpu.ops.dual_band import _smooth

    rng = np.random.default_rng(3)
    B, H, W = 2, 200, 260
    x = rng.uniform(0.0, 4000.0, (B, H, W)).astype(np.float32)
    fore = (x * 0.9 + rng.normal(size=(B, H, W)) * 5).astype(np.float32)
    back = (x * 1.1 + rng.normal(size=(B, H, W)) * 5).astype(np.float32)
    centers = rng.uniform(100.0, 400.0, (B,)).astype(np.float32)

    frac = 1.0 / (1.0 + jnp.exp(-(jnp.asarray(x) - centers[:, None, None]) / 100.0))
    sm = _smooth(frac, pallas_blend.RADIUS)
    ref = np.asarray(fore * sm + back * (1.0 - sm))

    # every rows_tile the on-chip sweep (benchmarks/kernel_sweep.py blend)
    # may adopt must be parity-clean, including values that do not divide H
    for rows_tile in (32, 48, 64, 96):
        got = np.asarray(
            pallas_blend.blend_smooth_mix(
                jnp.asarray(x), jnp.asarray(fore), jnp.asarray(back),
                jnp.asarray(centers), 100.0, rows_tile=rows_tile,
                interpret=True,
            )
        )
        np.testing.assert_allclose(
            got, ref, rtol=2e-5, atol=2e-2,
            err_msg=f"rows_tile={rows_tile}",
        )


def test_pallas_blend_stacked_pair_bitexact():
    """back=None reads both bands from the stacked (2B, H, W) buffer by
    block index (the round-5 split-copy removal) — output must be
    BIT-identical to the split-argument call."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops import pallas_blend

    rng = np.random.default_rng(31)
    B, H, W = 2, 200, 260
    x = rng.uniform(0.0, 4000.0, (B, H, W)).astype(np.float32)
    fore = (x * 0.9 + rng.normal(size=(B, H, W)) * 5).astype(np.float32)
    back = (x * 1.1 + rng.normal(size=(B, H, W)) * 5).astype(np.float32)
    centers = rng.uniform(100.0, 400.0, (B,)).astype(np.float32)
    split = np.asarray(pallas_blend.blend_smooth_mix(
        jnp.asarray(x), jnp.asarray(fore), jnp.asarray(back),
        jnp.asarray(centers), 100.0, interpret=True,
    ))
    stacked = np.asarray(pallas_blend.blend_smooth_mix(
        jnp.asarray(x), jnp.asarray(np.concatenate([fore, back])), None,
        jnp.asarray(centers), 100.0, interpret=True,
    ))
    np.testing.assert_array_equal(split, stacked)
    with pytest.raises(ValueError, match="stacked band pair"):
        pallas_blend.blend_smooth_mix(
            jnp.asarray(x), jnp.asarray(fore), None,
            jnp.asarray(centers), 100.0, interpret=True,
        )


def test_dual_band_fused_blend_wiring(monkeypatch):
    """dual_band_destripe_batch dispatches to the fused blend kernel above
    the size gate; its output must match the XLA formulation end to end."""
    import os

    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.dual_band import dual_band_destripe_batch
    from aind_smartspim_destripe_tpu.ops.filter import build_plan, FilterConfig

    h, w = 560, 720  # >= band gate per side, h*w >= 400k (blend gate)
    plan = build_plan(
        h, w,
        FilterConfig(wavelet="db3", level=None, sigma=256, max_threshold=12),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.clip(
        400 + (rng.normal(size=(1, h, 1)) * 60) * np.ones((1, 1, w))
        + rng.normal(size=(1, h, w)) * 10, 0, 65535).astype(np.float32))

    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        dense = np.asarray(dual_band_destripe_batch(plan, x, 100.0, -1.0))
    finally:
        del os.environ["DESTRIPE_NO_PALLAS"]

    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    got = np.asarray(dual_band_destripe_batch(plan, x, 100.0, -1.0))
    mse = float(np.mean((got - dense) ** 2))
    psnr = 10.0 * np.log10(65535.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 60.0, f"fused-blend dual PSNR {psnr:.1f} dB < 60"


def test_dual_band_matches_independent_float64_oracle():
    """Independent end-to-end oracle for config 2: compose the dual output
    in float64 numpy from the golden single-band filter
    (G.log_space_fft_filtering_ref per config), the golden per-plane Otsu
    center on the raw plane, a scipy uniform_filter(17, mode='nearest')
    box smooth (verified == ops.dual_band._smooth to f32 eps), and the
    sigmoid band mix. Until now dual was gated only against its own parts
    (dual == two singles, Pallas blend == XLA blend) — this pins the blend
    SEMANTICS (center choice, sigmoid orientation, smoothing) externally."""
    from scipy import ndimage

    import jax.numpy as jnp

    from tests.golden import numpy_ref as G
    from aind_smartspim_destripe_tpu.ops.dual_band import (
        _dual_plan, dual_band_destripe_batch,
    )

    h, w = 96, 128
    imgs = np.stack([synthetic_plane(h, w, seed=s) for s in (3, 4)])
    sig_fore, sig_back, thr, crossover = 256.0, 64.0, 12.0, 100.0

    want = []
    for img in imgs.astype(np.float64):
        fore = G.log_space_fft_filtering_ref(
            img, wavelet_name="db3", level=None, sigma=sig_fore,
            max_threshold=thr,
        )[:h, :w]
        back = G.log_space_fft_filtering_ref(
            img, wavelet_name="db3", level=None, sigma=sig_back,
            max_threshold=thr,
        )[:h, :w]
        center = G.threshold_otsu_ref(img.astype(np.float32))
        frac = 1.0 / (1.0 + np.exp(-(img - center) / crossover))
        frac = ndimage.uniform_filter(frac, size=17, mode="nearest")
        want.append(fore * frac + back * (1.0 - frac))
    want = np.stack(want)

    plan = _dual_plan(h, w, "db3", None, sig_fore, sig_back, thr)
    got = np.asarray(dual_band_destripe_batch(
        plan, jnp.asarray(imgs.astype(np.float32)), crossover, -1.0,
        consts=plan.constants(),
    ))

    u16g = np.clip(got, 0, 65535).astype(np.uint16)
    u16w = np.clip(want, 0, 65535).astype(np.uint16)
    mse = np.mean((u16g.astype(np.float64) - u16w.astype(np.float64)) ** 2)
    p = 10 * np.log10(65535.0**2 / max(mse, 1e-12))
    assert p > 80, f"dual-band PSNR vs float64 oracle too low: {p:.1f} dB"


def test_pallas_blend_uint16_ingest_bitexact():
    """Integer-valued planes through the u16 ingest (pad stays uint16, the
    kernel converts in-VMEM) must blend bit-identically to the f32 call —
    every 16-bit value is exactly representable, so the sigmoid sees the
    same bits."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops import pallas_blend

    rng = np.random.default_rng(41)
    B, H, W = 2, 200, 260
    x16 = rng.integers(0, 65536, size=(B, H, W), dtype=np.uint16)
    fore = rng.normal(scale=300.0, size=(B, H, W)).astype(np.float32) + 500
    back = rng.normal(scale=300.0, size=(B, H, W)).astype(np.float32) + 500
    centers = rng.uniform(100.0, 4000.0, (B,)).astype(np.float32)
    f32 = np.asarray(pallas_blend.blend_smooth_mix(
        jnp.asarray(x16.astype(np.float32)), jnp.asarray(fore),
        jnp.asarray(back), jnp.asarray(centers), 100.0, interpret=True,
    ))
    u16 = np.asarray(pallas_blend.blend_smooth_mix(
        jnp.asarray(x16), jnp.asarray(fore), jnp.asarray(back),
        jnp.asarray(centers), 100.0, interpret=True,
    ))
    np.testing.assert_array_equal(u16, f32)


@pytest.mark.parametrize("no_pallas", [False, True])
def test_dual_band_uint16_input_bitexact(monkeypatch, no_pallas):
    """The full dual step fed raw uint16 (the production pipeline's dtype)
    must reproduce the f32-fed output bit-for-bit on BOTH the fused-kernel
    path (in-VMEM conversion) and the XLA fallback (cast in blend_bands_xla
    / the otsu vmap)."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.dual_band import (
        _dual_plan, dual_band_destripe_batch,
    )

    if no_pallas:
        monkeypatch.setenv("DESTRIPE_NO_PALLAS", "1")
    else:
        monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    h, w = 560, 720  # above the band + blend size gates
    rng = np.random.default_rng(17)
    x16 = np.clip(
        400 + (rng.normal(size=(1, h, 1)) * 60) * np.ones((1, 1, w))
        + rng.normal(size=(1, h, w)) * 10, 0, 65535,
    ).astype(np.uint16)
    plan = _dual_plan(h, w, "db3", None, 256.0, 128.0, 12.0)
    consts = plan.constants()
    got16 = np.asarray(dual_band_destripe_batch(
        plan, jnp.asarray(x16), 100.0, -1.0, consts=consts))
    got32 = np.asarray(dual_band_destripe_batch(
        plan, jnp.asarray(x16.astype(np.float32)), 100.0, -1.0,
        consts=consts))
    np.testing.assert_array_equal(got16, got32)
