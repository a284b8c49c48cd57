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


def _mixed_batch(H=320, W=256):
    """Planes that exercise BOTH classifier branches: a dim striped
    background plane and a bright cells-like plane."""
    rng = np.random.default_rng(3)
    stripes = (rng.normal(size=(1, H, 1)) * 50) * np.ones((1, 1, W))
    dim = 300 + stripes[0]
    bright = 3000 + stripes[0] + rng.normal(size=(H, W)) * 40
    return np.clip(np.stack([dim, bright]), 0, 65535).astype(np.uint16)


def _plan(H, W, level=None):
    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )

    cells = FilterConfig(wavelet="db3", level=level, sigma=64.0,
                         max_threshold=4.0)
    no_cells = FilterConfig(wavelet="db3", level=level, sigma=128.0,
                            max_threshold=12.0)
    return build_plan(H, W, cells, no_cells)


def test_destripe_y_sharded_matches_production_kernel():
    """Multi-level destripe with rows sharded over the mesh must match
    destripe_batch: per-plane classifier, per-level Otsu, delta synthesis
    (level=None production semantics), both epilogues."""
    import os

    mesh = _mesh()
    os.environ["DESTRIPE_NO_PALLAS"] = "1"  # CPU mesh: dense path
    try:
        from aind_smartspim_destripe_tpu.ops.filter import destripe_batch
        from aind_smartspim_destripe_tpu.parallel.halo import (
            destripe_y_sharded, halo_constants,
        )

        img = _mixed_batch()
        plan = _plan(*img.shape[1:])
        assert plan.n_levels >= 4  # multi-level, with a replicated tail
        _, static = halo_constants(plan, mesh.shape["z"])
        assert static.get(0) is not None  # finest level genuinely sharded
        assert any(v is None for v in static.values()) or len(static) < plan.n_levels

        want = np.asarray(
            destripe_batch(plan, jnp.asarray(img, jnp.float32), 2700.0)
        )
        got = np.asarray(
            destripe_y_sharded(jnp.asarray(img), mesh, plan,
                               microscope_high_int=2700.0)
        )
        np.testing.assert_allclose(got, want, atol=0.5, rtol=1e-4)

        # wrap epilogue (uint16 zarr cast): <= 1 LSB vs unsharded
        got_w = np.asarray(
            destripe_y_sharded(jnp.asarray(img), mesh, plan,
                               microscope_high_int=2700.0, wrap=True)
        )
        from aind_smartspim_destripe_tpu.ops.filter import wrap_cast

        want_w = np.asarray(wrap_cast(jnp.asarray(want)))
        assert got_w.dtype == np.uint16
        assert np.abs(got_w.astype(np.int32) - want_w.astype(np.int32)).max() <= 1

        # flat-field epilogue
        H, W_ = img.shape[1:]
        flat = 1.0 + 0.1 * np.outer(
            np.hanning(H), np.hanning(W_)
        ).astype(np.float32)
        dark = np.zeros((H, W_), np.float32)
        from aind_smartspim_destripe_tpu.ops.flatfield import (
            flatfield_correction,
        )

        got_f = np.asarray(
            destripe_y_sharded(jnp.asarray(img), mesh, plan,
                               microscope_high_int=2700.0,
                               flat=jnp.asarray(flat), dark=jnp.asarray(dark))
        )
        want_f = np.asarray(
            flatfield_correction(jnp.asarray(want), jnp.asarray(flat),
                                 jnp.asarray(dark))
        )
        assert np.abs(got_f.astype(np.int32) - want_f.astype(np.int32)).max() <= 1
    finally:
        os.environ.pop("DESTRIPE_NO_PALLAS", None)


def test_destripe_y_sharded_jitted_with_device_constants():
    """The production form: halo shard plans ride the jit boundary as
    ARGUMENTS (device-resident), not embedded literals."""
    import os

    mesh = _mesh()
    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        from functools import partial

        from aind_smartspim_destripe_tpu.parallel.halo import (
            destripe_y_sharded, halo_constants,
        )

        img = _mixed_batch()
        plan = _plan(*img.shape[1:])
        consts = plan.constants(dense_only=True)
        harrs, hstatic = halo_constants(plan, mesh.shape["z"])

        @partial(jax.jit)
        def step(x, consts, harrs):
            return destripe_y_sharded(
                x, mesh, plan, consts, harrs, hstatic,
                microscope_high_int=2700.0,
            )

        got = np.asarray(step(jnp.asarray(img), consts, harrs))
        want = np.asarray(
            destripe_y_sharded(jnp.asarray(img), mesh, plan,
                               microscope_high_int=2700.0)
        )
        np.testing.assert_allclose(got, want, atol=0.5, rtol=1e-4)
    finally:
        os.environ.pop("DESTRIPE_NO_PALLAS", None)
