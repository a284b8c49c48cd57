"""Pallas DWT analysis-pass kernel: interpret-mode equivalence tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
jnp = jax.numpy

from aind_smartspim_destripe_tpu.ops import pallas_dwt
from aind_smartspim_destripe_tpu.ops.wavelets import (
    analysis_operator,
    dwt_coeff_len,
    wavelet,
)


@pytest.mark.parametrize("shape", [(2, 100, 130), (1, 16, 16), (3, 257, 129)])
def test_rows_pass_matches_dense(shape):
    wav = wavelet("db3")
    rng = np.random.default_rng(0)
    x = rng.normal(size=shape).astype(np.float32)
    lo, hi = pallas_dwt.an_pass_rows(jnp.asarray(x), wav, interpret=True)
    B, H, W = shape
    A = analysis_operator(H, "db3")
    L = dwt_coeff_len(H, 6)
    dense = np.einsum("ih,bhw->biw", A, x)
    assert lo.shape == (B, L, W) and hi.shape == (B, L, W)
    np.testing.assert_allclose(np.asarray(lo), dense[:, :L], atol=5e-4)
    np.testing.assert_allclose(np.asarray(hi), dense[:, L:], atol=5e-4)


def test_rows_pass_db2(shape=(2, 60, 70)):
    wav = wavelet("db2")
    rng = np.random.default_rng(1)
    x = rng.normal(size=shape).astype(np.float32)
    lo, hi = pallas_dwt.an_pass_rows(jnp.asarray(x), wav, interpret=True)
    A = analysis_operator(shape[1], "db2")
    L = dwt_coeff_len(shape[1], 4)
    dense = np.einsum("ih,bhw->biw", A, x)
    np.testing.assert_allclose(np.asarray(lo), dense[:, :L], atol=5e-4)
    np.testing.assert_allclose(np.asarray(hi), dense[:, L:], atol=5e-4)
