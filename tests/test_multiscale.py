"""Windowed-mean pyramid op: crop semantics, dtype preservation, odd shapes."""

import numpy as np

from aind_smartspim_destripe_tpu.ops.multiscale import windowed_mean, windowed_mean_np


def test_divisible_exact():
    x = np.arange(4 * 4 * 4, dtype=np.uint16).reshape(4, 4, 4)
    got = np.asarray(windowed_mean(x, (2, 2, 2)))
    want = windowed_mean_np(x, (2, 2, 2))
    np.testing.assert_array_equal(got, want)
    assert got.dtype == np.uint16


def test_odd_shapes_cropped():
    x = np.random.default_rng(0).integers(0, 1000, (5, 7, 9)).astype(np.uint16)
    got = np.asarray(windowed_mean(x, (2, 2, 2)))
    assert got.shape == (2, 3, 4)
    np.testing.assert_array_equal(got, windowed_mean_np(x, (2, 2, 2)))


def test_leading_axes_pass_through():
    x = np.random.default_rng(1).normal(size=(1, 1, 8, 8, 8)).astype(np.float32)
    got = np.asarray(windowed_mean(x, (2, 2, 2), preserve_dtype=False))
    assert got.shape == (1, 1, 4, 4, 4)
    np.testing.assert_allclose(
        got, windowed_mean_np(x, (2, 2, 2), preserve_dtype=False), rtol=1e-6, atol=1e-6
    )


def test_integer_truncation_matches_preserve_dtype():
    x = np.array([[[1, 2], [2, 2]]], dtype=np.uint16)  # mean = 1.75 -> 1
    got = np.asarray(windowed_mean(np.repeat(x, 2, axis=0), (2, 2, 2)))
    assert got[0, 0, 0] == 1
