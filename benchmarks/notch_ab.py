"""
A/B: dense-matmul notch vs spectral (rfft) notch INSIDE the Pallas halo
tier. The round-4 bandedx sweep that pinned "dense wins at every width
that fits" ran on the dense-XLA tier, where the O(W^2) x matmuls dominated
the step; the round-5 Pallas tier replaced those with blocked banded
kernels, so the dense-vs-banded gate now only decides the NOTCH form —
and the halo trace (ROADMAP round-5 session 5) shows the level-0 dense
notch matmul as the single largest sync op (3.77 ms of a 16.56 ms step at
W=8192 B=4). This re-runs the crossover with the Pallas tier ON.

Usage: python benchmarks/notch_ab.py [W ...]  (default 4096 8192 16384)
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(widths, B=4, H=1600, iters=12):
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

    enable_compile_cache()
    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    for W_ in widths:
        plan = build_plan(
            H, W_,
            FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
            FilterConfig(wavelet="db3", level=None, sigma=128,
                         max_threshold=12),
        )
        img = np.clip(
            300 + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W_))
            + rng.normal(size=(B, H, W_)) * 10, 0, 65535,
        ).astype(np.uint16)
        dev = jax.device_put(img)
        res = {}
        # sel-notch: the chunked per-plane-selected Pallas banks (half the
        # dense form's notch FLOPs); dense-notch: the compute-both-bands
        # XLA matmul; fft-notch: the spectral form (memory-gate fallback)
        for tag, gate, nb in (
            ("sel-notch", 1 << 30, True),
            ("dense-notch", 1 << 30, False),
            ("fft-notch", 1, False),
        ):
            harrs, hstatic = halo_constants(
                plan, 1, x_blocks=True, notch_blocks=nb
            )
            harrs = jax.device_put(harrs)
            consts = jax.device_put(
                plan.constants(dense_only=True, banded_x_min_w=gate)
            )

            @partial(jax.jit, static_argnums=(0,))
            def loop(n, images, consts, harrs):
                def body(tok, _):
                    x, _t = jax.lax.optimization_barrier((images, tok))
                    out = destripe_y_sharded(
                        x, mesh, plan, consts, harrs, hstatic, wrap=True,
                    )
                    return out[0, 0, 0].astype(jnp.float32) + _t, ()

                tok, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=n)
                return tok

            try:
                _ = float(np.asarray(loop(iters, dev, consts, harrs)))
                best = float("inf")
                for _rep in range(3):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(loop(iters, dev, consts, harrs)))
                    best = min(best, time.perf_counter() - t0)
                ms = best / iters * 1e3
                res[tag] = ms
                print(f"W={W_} {tag}: {ms:.2f} ms/step "
                      f"({iters * B * H * W_ / best / 1e6:.0f} MPix/s)",
                      flush=True)
            except Exception as e:
                res[tag] = None
                print(f"W={W_} {tag}: FAILED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})", flush=True)
        d, f, s = (res.get("dense-notch"), res.get("fft-notch"),
                   res.get("sel-notch"))
        if d and f:
            print(f"W={W_}: fft/dense = {f / d:.2f}x", flush=True)
        if d and s:
            print(f"W={W_}: sel/dense = {s / d:.2f}x", flush=True)


if __name__ == "__main__":
    ws = [int(a) for a in sys.argv[1:]] or [4096, 8192, 16384]
    run(ws)
