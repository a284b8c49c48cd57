"""Pallas sort-free row median: interpret-mode exactness vs numpy."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from aind_smartspim_destripe_tpu.ops.pallas_median import row_median_batch


@pytest.mark.parametrize(
    "shape", [(3, 10, 1002), (2, 7, 13), (5, 101), (4, 8, 16), (1, 1, 2)]
)
@pytest.mark.parametrize("scale", [1e-4, 1.0, 1e4])
def test_exact_vs_numpy(shape, scale):
    rng = np.random.default_rng(hash((shape, scale)) % 2**31)
    x = (rng.normal(size=shape) * scale).astype(np.float32)
    x[..., 0] *= -1  # mixed signs
    got = np.asarray(row_median_batch(jnp.asarray(x), interpret=True))
    want = np.median(x, axis=-1, keepdims=True).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_with_zeros_and_duplicates():
    x = np.array(
        [[0.0, -0.0, 1.0, 1.0, -2.0], [3.0, 3.0, 3.0, 3.0, 3.0]], np.float32
    )
    got = np.asarray(row_median_batch(jnp.asarray(x), interpret=True))
    want = np.median(x, axis=-1, keepdims=True).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_row_median_masked_matches_reference_formulation():
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.pallas_median import row_median_masked

    rng = np.random.default_rng(9)
    x = rng.normal(scale=3.0, size=(4, 37, 203)).astype(np.float32)
    thr = np.array([0.5, 2.0, 0.0, 100.0], np.float32)
    got = np.asarray(row_median_masked(jnp.asarray(x), jnp.asarray(thr), interpret=True))
    mask = np.sqrt(x * x) > thr[:, None, None]
    background = x * (1 - mask)
    want = np.median(background, axis=-1, keepdims=True).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_row_median_masked_even_and_ragged():
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.pallas_median import row_median_masked

    rng = np.random.default_rng(10)
    x = rng.normal(size=(2, 9, 130)).astype(np.float32)  # even n, ragged rows/lanes
    thr = np.array([0.7, 0.1], np.float32)
    got = np.asarray(row_median_masked(jnp.asarray(x), jnp.asarray(thr), interpret=True))
    background = x * (1 - (np.sqrt(x * x) > thr[:, None, None]))
    want = np.median(background, axis=-1, keepdims=True).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
