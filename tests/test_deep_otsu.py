"""
Batched deep-level Otsu (ops/filter._deep_otsu_sqrt_batched, the round-5
small-level-tail A/B): one folded Pallas histogram call over many narrow
detail bands must reproduce the per-level XLA Otsu EXACTLY — binning is
position-independent, NaN padding self-masks, and counts are exact 0/1
accumulation — and the full destripe_batch must be unchanged with the knob
on (the thresholds feed the identical filter math).
"""

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    _deep_otsu_sqrt_batched,
    build_plan,
    destripe_batch,
)
from aind_smartspim_destripe_tpu.ops.otsu import threshold_otsu_batch

import jax.numpy as jnp


def test_batched_deep_otsu_exact(monkeypatch):
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(23)
    # production-like deep-level shapes (levels 3..7 of a 1600x2000 plan)
    shapes = [(102, 127), (52, 65), (27, 34), (15, 18), (9, 11)]
    chs = [
        jnp.asarray((rng.normal(size=(3,) + s) * (i + 1)).astype(np.float32))
        for i, s in enumerate(shapes)
    ]
    got = _deep_otsu_sqrt_batched(chs)
    for ch, th in zip(chs, got):
        want = np.sqrt(np.asarray(
            threshold_otsu_batch(ch * ch, pallas=False)
        ))
        np.testing.assert_array_equal(np.asarray(th), want)


@pytest.mark.parametrize("dual", [False, True])
def test_destripe_batch_unchanged_with_knob(monkeypatch, dual):
    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(29)
    H, W = 640, 768  # >= 3 dense-path levels under the 32k px gate
    img = np.clip(
        np.where(np.arange(2)[:, None, None] % 2 == 0, 300.0, 3200.0)
        + (rng.normal(size=(2, H, 1)) * 50) * np.ones((1, 1, W))
        + rng.normal(size=(2, H, W)) * 10, 0, 65535,
    ).astype(np.uint16)
    plan = build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    consts = plan.constants()
    monkeypatch.setenv("DESTRIPE_DEEP_OTSU", "0")
    base = np.asarray(destripe_batch(
        plan, jnp.asarray(img), 2500.0, consts, dual=dual
    ))
    monkeypatch.setenv("DESTRIPE_DEEP_OTSU", "1")
    got = np.asarray(destripe_batch(
        plan, jnp.asarray(img), 2500.0, consts, dual=dual
    ))
    np.testing.assert_array_equal(base, got)
