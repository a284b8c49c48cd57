"""
StreamingDestriper unit behaviors: no-flatfield cast semantics, geometry
validation, journal invalidation, 3-D arrays, device-batch padding.
"""

import numpy as np
import pytest

from aind_smartspim_destripe_tpu.io.zarr import ZarrArray
from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    build_plan,
    destripe_batch,
)
from aind_smartspim_destripe_tpu.runtime.pipeline import StreamingDestriper

H, W, Z = 48, 64, 10


def _plan():
    return build_plan(
        H, W,
        FilterConfig(sigma=64, max_threshold=3),
        FilterConfig(sigma=128, max_threshold=12),
    )


def _arrays(tmp_path, z=Z):
    rng = np.random.default_rng(0)
    vol = np.clip(
        300 + (rng.normal(size=(z, H, 1)) * 50) * np.ones((1, 1, W)), 0, 65535
    ).astype(np.uint16)
    inp = ZarrArray.create(str(tmp_path / "in"), (z, H, W), (4, H, W), np.uint16)
    inp[:] = vol
    out = ZarrArray.create(str(tmp_path / "out"), (z, H, W), (4, H, W), np.uint16)
    return vol, inp, out


def test_no_flatfield_wrap_cast(tmp_path):
    """Without flats the float filter output is cast zarr-style (wrap, not
    clip) — matching the reference's raw float write
    (zarr_destriper.py:333-336 dead-clip quirk)."""
    vol, inp, out = _arrays(tmp_path)
    pipe = StreamingDestriper(
        inp, out, _plan(), flatfield=None, slab=4, device_batch=3, journal=False
    )
    stats = pipe.run()
    assert stats.planes == Z
    want = np.asarray(
        destripe_batch(_plan(), vol.astype(np.float32), 2500.0)
    ).astype(np.uint16)  # wrap cast
    got = out[:]
    assert (np.abs(got.astype(int) - want.astype(int)) <= 1).mean() > 0.999


def test_geometry_mismatch_raises(tmp_path):
    _, inp, out = _arrays(tmp_path)
    bad_plan = build_plan(
        32, 32,
        FilterConfig(sigma=64, max_threshold=3),
        FilterConfig(sigma=128, max_threshold=12),
    )
    with pytest.raises(ValueError):
        StreamingDestriper(inp, out, bad_plan)


def test_bad_flat_shape_raises(tmp_path):
    _, inp, out = _arrays(tmp_path)
    with pytest.raises(ValueError):
        StreamingDestriper(inp, out, _plan(), flatfield=np.ones((4, 4), np.float32))


def test_journal_invalidated_by_config_change(tmp_path):
    vol, inp, out = _arrays(tmp_path)
    p = _plan()
    flat = np.ones((H, W), np.float32)
    pipe = StreamingDestriper(inp, out, p, flatfield=flat, slab=4)
    pipe.run()
    # same config resumes
    pipe2 = StreamingDestriper(inp, out, p, flatfield=flat, slab=4)
    assert pipe2.run().slabs_skipped == -(-Z // 4)
    # different slab geometry invalidates the journal
    pipe3 = StreamingDestriper(inp, out, p, flatfield=flat, slab=5)
    stats3 = pipe3.run()
    assert stats3.slabs_skipped == 0 and stats3.planes == Z


def test_2d_input_rejected(tmp_path):
    _, inp, out = _arrays(tmp_path)

    class Fake:
        shape = (H, W)

    with pytest.raises(ValueError):
        StreamingDestriper(Fake(), out, _plan())
