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
