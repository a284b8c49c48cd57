"""
Halo-tier step trace budget: run the Y-halo route's Pallas-tier step
(parallel/halo.destripe_y_sharded, 1-device mesh) at a beyond-plane-path
width as the bench-style scan-chained device loop under a jax.profiler
trace, then summarize per-op device time with trace_sum — op-level
attribution for the tier the round-5 session-1 sweep lifted to
2.3-3.1 GPix/s/device, to find what stands between it and the 10.5 GPix/s
plane path.

Usage: python benchmarks/halo_trace.py [W] [B] [iters]
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trace_sum  # noqa: E402  (benchmarks/ sibling)


def main(W=8192, B=4, iters=16, rows=40):
    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )
    from aind_smartspim_destripe_tpu.parallel.halo import (
        destripe_y_sharded, halo_constants,
    )
    from aind_smartspim_destripe_tpu.parallel.mesh import make_mesh
    from aind_smartspim_destripe_tpu.runtime import enable_compile_cache
    from aind_smartspim_destripe_tpu.runtime.tracing import device_trace

    enable_compile_cache()
    H = 1600
    mesh = make_mesh(1)
    plan = build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )
    rng = np.random.default_rng(0)
    img = np.clip(
        300 + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(B, H, W)) * 10, 0, 65535,
    ).astype(np.uint16)
    dev = jax.device_put(img)
    harrs, hstatic = halo_constants(plan, 1, x_blocks=True)
    harrs = jax.device_put(harrs)
    consts = jax.device_put(plan.constants(dense_only=True))

    @jax.jit
    def loop(images, consts, harrs):
        def body(tok, _):
            x, t = jax.lax.optimization_barrier((images, tok))
            out = destripe_y_sharded(
                x, mesh, plan, consts, harrs, hstatic, wrap=True,
            )
            return out[0, 0, 0].astype(jnp.float32) + t, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return tok

    _ = float(np.asarray(loop(dev, consts, harrs)))  # compile + warm
    trace_dir = os.environ.get(
        "DESTRIPE_TRACE_DIR", tempfile.mkdtemp(prefix="halo_trace_")
    )
    with device_trace(trace_dir):
        t0 = time.perf_counter()
        _ = float(np.asarray(loop(dev, consts, harrs)))
        dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    print(f"halo step W={W} B={B}: {ms:.2f} ms/step  "
          f"({iters * B * H * W / dt / 1e6:.0f} MPix/s)", flush=True)

    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not pbs:
        print(f"no xplane.pb under {trace_dir}")
        return
    for name, agg, cnt in trace_sum.summarize(pbs[-1], iters, rows):
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        tot = sum(agg.values())
        print(f"== plane {name}: {tot:.2f} ms/step device op time")
        for nm, msv in agg.most_common(rows):
            print(f"  {msv:8.3f} ms x{cnt[nm] // max(iters, 1):<4} {nm[:140]}")


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
