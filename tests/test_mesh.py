"""
Multi-chip sharding tests on the virtual 8-device CPU mesh (the distributed
tier the reference lacks; SURVEY.md section 4 implication).
"""

import jax
import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    build_plan,
    destripe_batch,
)
from aind_smartspim_destripe_tpu.parallel.mesh import (
    global_minmax,
    make_mesh,
    shard_planes,
    sharded_destripe_step,
    sharded_normalize_image,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _plan(h, w):
    return build_plan(
        h, w,
        FilterConfig(sigma=64, max_threshold=3),
        FilterConfig(sigma=128, max_threshold=12),
    )


def test_sharded_step_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    h, w = 48, 64
    images = rng.integers(0, 3000, size=(16, h, w)).astype(np.uint16)
    flat = np.full((h, w), 1.2, np.float32)
    dark = np.full((h, w), 4.0, np.float32)
    plan = _plan(h, w)

    with mesh:
        step = sharded_destripe_step(mesh, plan, with_flatfield=True)
        out, stats = step(images, flat, dark)
    out = np.asarray(out)

    from aind_smartspim_destripe_tpu.ops.flatfield import flatfield_correction

    want = np.asarray(
        flatfield_correction(
            destripe_batch(plan, images.astype(np.float32), 2500.0), flat, dark
        )
    )
    assert (np.abs(out.astype(int) - want.astype(int)) <= 1).all()
    assert out.dtype == np.uint16


def test_sharding_layout(mesh):
    x = np.zeros((16, 8, 8), np.float32)
    sharded = shard_planes(mesh, x)
    # each device holds 2 planes
    shard_shapes = {tuple(s.data.shape) for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 8, 8)}


def test_global_minmax_collective(mesh):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 16, 16)).astype(np.float32)
    xs = shard_planes(mesh, x)
    lo, hi = global_minmax(mesh, xs)
    np.testing.assert_allclose(float(lo), x.min(), rtol=1e-6)
    np.testing.assert_allclose(float(hi), x.max(), rtol=1e-6)


def test_sharded_normalize_matches_reference_semantics(mesh):
    rng = np.random.default_rng(2)
    x = rng.uniform(100, 900, size=(8, 16, 16)).astype(np.float32)
    got = np.asarray(sharded_normalize_image(mesh, x))
    want = 1 + ((x - x.min()) / (x.max() - x.min())).astype(np.float16)
    np.testing.assert_array_equal(got.astype(np.float16), want.astype(np.float16))


def test_graft_entry_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    assert callable(fn) and len(args) == 4
    ge.dryrun_multichip(8)


def test_2d_mesh_tiles_by_planes(mesh):
    from aind_smartspim_destripe_tpu.parallel.mesh import (
        make_mesh_2d,
        sharded_destripe_step_2d,
    )

    mesh2 = make_mesh_2d(8, tile_parallel=2)
    assert mesh2.devices.shape == (2, 4)
    h, w = 48, 64
    plan = _plan(h, w)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 3000, size=(2, 8, h, w)).astype(np.uint16)
    flats = np.stack([np.full((h, w), 1.0 + 0.2 * t, np.float32) for t in range(2)])
    darks = np.zeros((2, h, w), np.float32)

    with mesh2:
        step = sharded_destripe_step_2d(mesh2, plan)
        out, stats = step(images, flats, darks)
    out = np.asarray(out)
    assert out.shape == images.shape and out.dtype == np.uint16
    assert np.asarray(stats).shape == (2, 2)

    # per-tile flat actually applied: tile 1 divided by a larger flat
    from aind_smartspim_destripe_tpu.ops.flatfield import flatfield_correction

    want1 = np.asarray(
        flatfield_correction(
            destripe_batch(plan, images[1].astype(np.float32), 2500.0),
            flats[1], darks[1],
        )
    )
    assert (np.abs(out[1].astype(int) - want1.astype(int)) <= 1).all()
