"""
Dual-band step trace budget (VERDICT r4 next-item 3): run the BASELINE
config-2 dual step (B=64, 1600x2000, production knobs) as the bench-style
scan-chained device loop under a jax.profiler trace, then summarize the
per-op device time with trace_sum — giving the dual step the same op-level
attribution table the single-band step has (ROADMAP round-3 section).

Usage: python benchmarks/dual_trace.py [iters]
Prints ms/step + MPix/s, then the top device ops per step.
"""

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import trace_sum  # noqa: E402  (benchmarks/ sibling)


def main(iters=24):
    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.dual_band import (
        _dual_plan, dual_band_destripe_batch,
    )
    from aind_smartspim_destripe_tpu.ops.filter import device_constants
    from aind_smartspim_destripe_tpu.runtime import enable_compile_cache
    from aind_smartspim_destripe_tpu.runtime.tracing import device_trace

    enable_compile_cache()
    B, H, W = 64, 1600, 2000
    rng = np.random.default_rng(0)
    level = np.where(np.arange(B) % 2 == 0, 300.0, 3200.0)[:, None, None]
    base = np.clip(
        level + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(B, H, W)) * 10, 0, 65535,
    ).astype(np.uint16)  # production device dtype (in-kernel ingest)
    imgs = jax.device_put(base)

    plan_d = _dual_plan(H, W, "db3", None, 256.0, 128.0, 12.0)
    cd = device_constants(plan_d)

    @jax.jit
    def loop(x, consts):
        def body(tok, _):
            xx, t = jax.lax.optimization_barrier((x, tok))
            out = dual_band_destripe_batch(plan_d, xx, 100.0, -1.0, 8, consts)
            return out[0, 0, 0].astype(jnp.float32) + t, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return tok

    _ = float(np.asarray(loop(imgs, cd)))  # compile + warm
    trace_dir = os.environ.get(
        "DESTRIPE_TRACE_DIR", tempfile.mkdtemp(prefix="dual_trace_")
    )
    with device_trace(trace_dir):
        t0 = time.perf_counter()
        _ = float(np.asarray(loop(imgs, cd)))
        dt = time.perf_counter() - t0
    ms = dt / iters * 1e3
    print(f"dual step: {ms:.2f} ms/step  "
          f"({iters * B * H * W / dt / 1e6:.0f} MPix/s)", flush=True)

    pbs = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    if not pbs:
        print(f"no xplane.pb under {trace_dir}")
        return
    for name, agg, cnt in trace_sum.summarize(pbs[-1], iters, 40):
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        tot = sum(agg.values())
        print(f"== plane {name}: {tot:.2f} ms/step device op time")
        for nm, msv in agg.most_common(40):
            print(f"  {msv:8.3f} ms x{cnt[nm] // max(iters, 1):<4} {nm[:100]}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 24)
