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


def test_wrap_cast_out_of_range(tmp_path):
    """Out-of-range filter output must wrap like numpy astype (65537 -> 1),
    not saturate like a bare XLA cast (ADVICE round 1: device path diverged
    from the reference's float-into-uint16-zarr write on bright pixels)."""
    from aind_smartspim_destripe_tpu.runtime.pipeline import make_device_step

    plan = _plan()
    step = make_device_step(plan, 2500.0, with_flatfield=False)
    rng = np.random.default_rng(3)
    vol = np.clip(
        60000 + (rng.normal(size=(2, H, 1)) * 500) * np.ones((1, 1, W)), 0, 65535
    ).astype(np.uint16)
    # saturated region: destripe output ~ x + 2, so these pixels overshoot
    # 65535 and must wrap
    vol[:, : H // 2, : W // 2] = 65535
    flat = np.ones((1, 1), np.float32)
    dark = np.zeros((1, 1), np.float32)
    got = np.asarray(step(vol.astype(np.uint16), flat, dark))
    from aind_smartspim_destripe_tpu.ops.filter import destripe_batch as db

    want_float = np.asarray(db(plan, vol.astype(np.float32), 2500.0))
    want = want_float.astype(np.uint16)  # numpy wrap
    # destripe of near-max input overshoots 65535 (output ~ x + 2), so the
    # wrap must actually trigger somewhere for this test to mean anything
    assert (want_float > 65535.0).any()
    assert np.array_equal(got, want)


def test_write_backpressure_and_journal_under_concurrency(tmp_path):
    """Slow store + many slabs: in-flight writes stay bounded (no unbounded
    slab pile-up) and the commit journal survives concurrent writer threads
    intact (round-1 race: unlocked sorted(set) during add)."""
    import threading
    import time as _time

    z = 64
    vol, inp, out = _arrays(tmp_path, z=z)

    class SlowStore:
        def __init__(self, inner):
            self.inner = inner
            self.path = inner.path
            self.shape = inner.shape
            self.active = 0
            self.peak = 0
            self._lock = threading.Lock()

        def __setitem__(self, sl, val):
            with self._lock:
                self.active += 1
                self.peak = max(self.peak, self.active)
            _time.sleep(0.02)
            self.inner[sl] = val
            with self._lock:
                self.active -= 1

        def __getitem__(self, sl):
            return self.inner[sl]

    slow = SlowStore(out)
    prefetch = 2
    pipe = StreamingDestriper(
        inp, slow, _plan(), slab=2, device_batch=4, prefetch=prefetch, io_threads=8
    )
    stats = pipe.run()
    assert stats.planes == z and stats.slabs == z // 2
    # bound: prefetch+1 queued writes, +1 transiently while draining
    assert slow.peak <= prefetch + 2
    import json as _json

    state = _json.load(open(tmp_path / "out" / ".destripe_journal.json"))
    assert len(state["slabs"]) == z // 2
    assert sorted(map(tuple, state["slabs"])) == [(i, i + 2) for i in range(0, z, 2)]


def test_journal_concurrent_commits(tmp_path):
    from concurrent.futures import ThreadPoolExecutor

    from aind_smartspim_destripe_tpu.runtime.pipeline import _Journal

    path = str(tmp_path / "journal.json")
    j = _Journal(path, {"m": 1})
    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(lambda i: j.commit((i, i + 1)), range(300)))
    j2 = _Journal(path, {"m": 1})
    assert len(j2.done) == 300


def test_2d_input_rejected(tmp_path):
    _, inp, out = _arrays(tmp_path)

    class Fake:
        shape = (H, W)

    with pytest.raises(ValueError):
        StreamingDestriper(Fake(), out, _plan())


def test_pipeline_band_graph_interpret(tmp_path, monkeypatch):
    """The streaming pipeline's device step (fused flat-field epilogue on
    the banded Pallas path) through the interpreter — the CI twin of the
    on-chip production runs. Compares against the dense-path pipeline
    output at the 60 dB golden gate."""
    h, w, z = 640, 704, 4  # band-eligible geometry, small z
    plan = build_plan(
        h, w,
        FilterConfig(sigma=64, max_threshold=3),
        FilterConfig(sigma=128, max_threshold=12),
    )
    rng = np.random.default_rng(1)
    vol = np.clip(
        400 + (rng.normal(size=(z, h, 1)) * 60) * np.ones((1, 1, w))
        + rng.normal(size=(z, h, w)) * 10, 0, 65535
    ).astype(np.uint16)
    flat = np.full((h, w), 1.2, np.float32)
    dark = np.full((h, w), 4.0, np.float32)

    def run(sub):
        inp = ZarrArray.create(
            str(tmp_path / sub / "in"), (z, h, w), (z, h, w), np.uint16
        )
        inp[:] = vol
        out = ZarrArray.create(
            str(tmp_path / sub / "out"), (z, h, w), (z, h, w), np.uint16
        )
        StreamingDestriper(
            inp, out, plan, flatfield=flat, darkfield=dark,
            slab=z, device_batch=z, journal=False,
        ).run()
        return out[:]

    import os

    os.environ["DESTRIPE_NO_PALLAS"] = "1"
    try:
        want = run("dense")
    finally:
        del os.environ["DESTRIPE_NO_PALLAS"]

    monkeypatch.setenv("DESTRIPE_PALLAS_INTERPRET", "1")
    assert "band0" in plan.constants()
    got = run("band")

    mse = np.mean((got.astype(np.float64) - want.astype(np.float64)) ** 2)
    psnr = np.inf if mse == 0 else 10 * np.log10(65535.0**2 / mse)
    assert psnr >= 60.0, f"pipeline band-vs-dense PSNR {psnr:.1f} dB < 60"


def test_concurrent_unaligned_slab_writes_no_lost_planes(tmp_path):
    """Review-derived: slab writes that don't align to the output z-chunk
    share chunks; concurrent read-modify-writes used to race (one writer's
    planes reverting to fill). The array-level write lock serializes
    overlapping __setitem__ calls."""
    import threading

    from aind_smartspim_destripe_tpu.io.zarr import ZarrArray

    Z, H, W = 16, 32, 32
    vol = (np.arange(Z * H * W, dtype=np.uint16).reshape(Z, H, W) % 60001)
    for trial in range(10):
        p = str(tmp_path / f"r{trial}")
        arr = ZarrArray.create(p, (Z, H, W), (Z, 16, 16), np.uint16)
        barrier = threading.Barrier(2)

        def writer(z0, z1):
            barrier.wait()
            arr[z0:z1] = vol[z0:z1]  # both halves share every z-chunk

        ts = [threading.Thread(target=writer, args=a)
              for a in ((0, 8), (8, 16))]
        [t.start() for t in ts]
        [t.join() for t in ts]
        np.testing.assert_array_equal(arr[:, :, :], vol)


def test_journal_meta_pins_flat_content(tmp_path):
    """Resuming after the channel flats were re-estimated must recompute:
    the journal meta keys on the flat/dark CONTENT, not just with_flat."""
    from aind_smartspim_destripe_tpu.io.zarr import ZarrArray
    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )
    from aind_smartspim_destripe_tpu.runtime.pipeline import (
        StreamingDestriper,
    )

    Z, H, W = 8, 32, 40
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 3000, size=(Z, H, W)).astype(np.uint16)
    plan = build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=1, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=1, sigma=128, max_threshold=12),
    )
    out = ZarrArray.create(str(tmp_path / "o"), (Z, H, W), (8, 16, 16),
                           np.uint16)
    flat_a = np.full((H, W), 1.25, np.float32)
    dark = np.zeros((H, W), np.float32)
    import jax

    kw = dict(slab=4, device_batch=2, devices=jax.devices()[:1])
    s1 = StreamingDestriper(vol, out, plan, flatfield=flat_a,
                            darkfield=dark, **kw).run()
    assert s1.slabs_skipped == 0
    # same flats -> full skip
    s2 = StreamingDestriper(vol, out, plan, flatfield=flat_a,
                            darkfield=dark, **kw).run()
    assert s2.slabs_skipped == 2 and s2.planes == 0
    # re-estimated flats -> journal invalid, full recompute
    s3 = StreamingDestriper(vol, out, plan, flatfield=flat_a * 1.1,
                            darkfield=dark, **kw).run()
    assert s3.slabs_skipped == 0 and s3.planes == Z


def test_multichannel_5d_input_rejected():
    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )
    from aind_smartspim_destripe_tpu.runtime.pipeline import (
        StreamingDestriper,
    )

    plan = build_plan(
        32, 40,
        FilterConfig(wavelet="db3", level=1, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=1, sigma=128, max_threshold=12),
    )
    vol = np.zeros((1, 3, 8, 32, 40), np.uint16)
    with pytest.raises(ValueError, match="separately"):
        StreamingDestriper(vol, np.zeros_like(vol), plan)


def test_journal_tolerates_wrong_shape_json(tmp_path):
    from aind_smartspim_destripe_tpu.runtime.pipeline import _Journal

    p = str(tmp_path / "j.json")
    for content in ("null", "[]", '{"meta": {"a": 1}, "slabs": 3}',
                    '{"meta": {"a": 1}, "slabs": [1, 2]}'):
        with open(p, "w") as f:
            f.write(content)
        j = _Journal(p, {"a": 1})  # must not raise
        assert isinstance(j.done, set)
