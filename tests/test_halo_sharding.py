"""
Y-axis halo sharding (parallel/halo.py): the sharded banded passes must
match the unsharded operators exactly on an 8-virtual-device CPU mesh
(SURVEY §5 sequence-parallel analog; ROADMAP round-2 item 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops import wavelets as W
from aind_smartspim_destripe_tpu.parallel.halo import (
    banded_apply_y_sharded,
    dwt2_y_sharded,
    idwt2_y_sharded,
)
from aind_smartspim_destripe_tpu.parallel.mesh import make_mesh


def _mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    return make_mesh(len(jax.devices()), axis="z")


@pytest.mark.parametrize("H", [64, 70])  # divisible and ragged row counts
def test_banded_apply_matches_dense(H):
    mesh = _mesh()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, H, 40)).astype(np.float32)
    A = W.analysis_operator(H, "db3")
    L = A.shape[0] // 2
    for OP in (A[:L], A[L:]):
        got = np.asarray(banded_apply_y_sharded(jnp.asarray(x), OP, mesh, "z"))
        want = np.einsum("rh,bhw->brw", OP, x)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-5)


def test_dwt2_y_sharded_matches_unsharded():
    mesh = _mesh()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 64, 48)).astype(np.float32) * 10
    wav = W.wavelet("db3")
    ca_s, (ch_s, cv_s, cd_s) = dwt2_y_sharded(jnp.asarray(x), "db3", mesh, "z")
    ca, (ch, cv, cd) = W.dwt2(jnp.asarray(x), wav)
    for got, want in [(ca_s, ca), (ch_s, ch), (cv_s, cv), (cd_s, cd)]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=1e-4)


def test_idwt2_y_sharded_roundtrip():
    # taller image: the synthesis halo (~flen+1 coefficient rows) must fit in
    # one coefficient shard, so H/2 per-device rows must exceed it
    mesh = _mesh()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 160, 48)).astype(np.float32) * 10
    ca, det = dwt2_y_sharded(jnp.asarray(x), "db3", mesh, "z")
    rec = idwt2_y_sharded(ca, det, "db3", mesh, "z", out_shape=(160, 48))
    np.testing.assert_allclose(np.asarray(rec), x, atol=5e-4, rtol=1e-4)


def test_halo_guard_rejects_too_many_shards():
    mesh = _mesh()
    if mesh.shape["z"] < 4:
        pytest.skip("needs >= 4 devices")
    x = jnp.zeros((1, 16, 8), jnp.float32)  # 2 rows/shard on 8 devices
    A = W.analysis_operator(16, "db3")
    with pytest.raises(AssertionError, match="halo"):
        banded_apply_y_sharded(x, A[: A.shape[0] // 2], mesh, "z")


def test_destripe_y_sharded_matches_unsharded():
    """End-to-end single-level destripe with rows sharded over the mesh must
    match the unsharded kernel (reference level=1 semantics)."""
    import os

    mesh = _mesh()
    os.environ["DESTRIPE_NO_PALLAS"] = "1"  # CPU mesh: jnp fallback path
    try:
        from aind_smartspim_destripe_tpu.ops.filter import log_space_fft_filtering
        from aind_smartspim_destripe_tpu.parallel.halo import destripe_y_sharded

        rng = np.random.default_rng(3)
        img = np.clip(
            300 + (rng.normal(size=(2, 160, 1)) * 50) * np.ones((1, 1, 64)),
            0, 65535,
        ).astype(np.uint16)
        got = np.asarray(
            destripe_y_sharded(jnp.asarray(img), mesh, sigma=128.0,
                               max_threshold=12.0)
        )
        want = log_space_fft_filtering(
            img, wavelet="db3", level=1, sigma=128, max_threshold=12
        )
        np.testing.assert_allclose(got, want, atol=0.5, rtol=1e-4)
    finally:
        os.environ.pop("DESTRIPE_NO_PALLAS", None)
