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


def test_dual_shared_decomposition_matches_two_single_runs():
    """destripe_batch(dual=True) — one analysis, two notch/synthesis bands —
    must reproduce two independent single-band runs (up to f32 batch-extent
    vectorization jitter; the algorithms are identical per plane)."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig,
        build_plan,
        destripe_batch,
    )

    h, w = 96, 128
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
