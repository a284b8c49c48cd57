"""On-chip tile-size sweep for the destripe step's Pallas kernels.

Times the FULL production step (the bench.py harness: scan-chained
iterations, one D2H sync) with ONE tile knob monkeypatched per variant, so
measured deltas include every in-context effect — VMEM pressure, DMA
overlap, grid overhead — not just the isolated kernel. Each variant gets a
fresh trace (new jitted closure) so the patched default is actually seen.

Usage:
    python benchmarks/kernel_sweep.py notch 64 128 256   # notch rows_tile
    python benchmarks/kernel_sweep.py k2col 128 256 512  # an_y_pass col_tile
    python benchmarks/kernel_sweep.py k3col 128 256 512  # syn_y_pass col_tile
    python benchmarks/kernel_sweep.py bandedx 4096 8192  # dense vs banded x

Compile-fail variants (e.g. scoped-VMEM overflow at big tiles) are reported
as such, not crashed on. Timing is best-of-2 after a warm run.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sweep_banded_x(widths, B=2, H=1600, iters=8):
    """Dense-x vs banded/spectral-x crossover through the halo kernel
    (parallel/halo.py) on a 1-device mesh: times the SAME full filter with
    the width gate above every level (dense (W/2, W) matmuls + (w, 2w)
    notch operators) and below every level (blocked lowpass passes + rfft
    notch). Pinned the DESTRIPE_BANDED_X_MIN_W default — measured on chip
    2026-08-19: dense WINS at every width that fits HBM (banded/dense wall
    ratio 1.25x at W=2048, 1.38x at 4096, 1.60x at 8192, 1.84x at 16384),
    falsifying the round-3 FLOP-crossover assumption. The gate is therefore
    a MEMORY gate (see halo.banded_x_min_w_default): dense operator
    residency is O(W^2)/level (~2.2 GB at W=16384), so widths much beyond
    16k only run on the banded tier at all."""
    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )
    from aind_smartspim_destripe_tpu.parallel.halo import (
        destripe_y_sharded, halo_constants,
    )
    from aind_smartspim_destripe_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    results = {}
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
        harrs, hstatic = halo_constants(plan, 1)
        harrs = jax.device_put(harrs)
        for tag, gate in (("dense", 1 << 30), ("banded", 1)):
            consts = jax.device_put(
                plan.constants(dense_only=True, banded_x_min_w=gate)
            )

            @partial(jax.jit, static_argnums=(0,))
            def step_loop(n, images, consts, harrs):
                def body(tok, _):
                    x, _tok = jax.lax.optimization_barrier((images, tok))
                    out = destripe_y_sharded(
                        x, mesh, plan, consts, harrs, hstatic, wrap=True,
                    )
                    return out[0, 0, 0].astype(jnp.float32) + _tok, ()

                tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return tok

            try:
                _ = float(np.asarray(step_loop(iters, dev, consts, harrs)))
                best = float("inf")
                for _rep in range(2):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(
                        step_loop(iters, dev, consts, harrs)
                    ))
                    best = min(best, time.perf_counter() - t0)
                ms = best / iters * 1e3
                mpix = iters * B * H * W_ / best / 1e6
                results[(W_, tag)] = ms
                print(f"bandedx W={W_} {tag}: {ms:.2f} ms/step "
                      f"({mpix:.0f} MPix/s)", flush=True)
            except Exception as e:
                results[(W_, tag)] = None
                print(f"bandedx W={W_} {tag}: FAILED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})", flush=True)
        d, b = results.get((W_, "dense")), results.get((W_, "banded"))
        if d and b:
            print(f"bandedx W={W_}: banded/dense = {b / d:.2f}x", flush=True)
    return results


def sweep_halo_pallas(widths, B=2, H=1600, iters=8):
    """Per-shard Pallas tier vs dense-XLA tier through the FULL halo kernel
    (parallel/halo.py destripe_y_sharded) on a 1-device mesh — the round-5
    measurement for VERDICT r4 next-item 1: the dense tier measured
    316-705 MPix/s/device at 4k-16k widths (round-4 queue) because the
    dense O(W^2) x matmuls dominate; the Pallas tier runs the blocked
    banded K1/K4 x-kernels, psum'd Pallas Otsu histograms and radix-
    bisection medians per row shard instead. The env gate is read at TRACE
    time, so each variant gets a fresh jitted closure."""
    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig, build_plan,
    )
    from aind_smartspim_destripe_tpu.parallel.halo import (
        destripe_y_sharded, halo_constants,
    )
    from aind_smartspim_destripe_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1)
    rng = np.random.default_rng(0)
    results = {}
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
        harrs, hstatic = halo_constants(plan, 1, x_blocks=True)
        harrs = jax.device_put(harrs)
        consts = jax.device_put(plan.constants(dense_only=True))
        for tag, env in (("pallas", "1"), ("dense", "0")):
            os.environ["DESTRIPE_HALO_PALLAS"] = env

            @partial(jax.jit, static_argnums=(0,))
            def step_loop(n, images, consts, harrs):
                def body(tok, _):
                    x, _tok = jax.lax.optimization_barrier((images, tok))
                    out = destripe_y_sharded(
                        x, mesh, plan, consts, harrs, hstatic, wrap=True,
                    )
                    return out[0, 0, 0].astype(jnp.float32) + _tok, ()

                tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
                return tok

            try:
                _ = float(np.asarray(step_loop(iters, dev, consts, harrs)))
                best = float("inf")
                for _rep in range(2):
                    t0 = time.perf_counter()
                    _ = float(np.asarray(
                        step_loop(iters, dev, consts, harrs)
                    ))
                    best = min(best, time.perf_counter() - t0)
                ms = best / iters * 1e3
                mpix = iters * B * H * W_ / best / 1e6
                results[(W_, tag)] = ms
                print(f"halopallas W={W_} {tag}: {ms:.2f} ms/step "
                      f"({mpix:.0f} MPix/s)", flush=True)
            except Exception as e:
                results[(W_, tag)] = None
                print(f"halopallas W={W_} {tag}: FAILED ({type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]})", flush=True)
        os.environ.pop("DESTRIPE_HALO_PALLAS", None)
        d, p = results.get((W_, "dense")), results.get((W_, "pallas"))
        if d and p:
            print(f"halopallas W={W_}: pallas speedup = {d / p:.2f}x",
                  flush=True)
    return results


def main(argv):
    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.runtime import enable_compile_cache

    enable_compile_cache()

    if argv and argv[0] == "bandedx":
        widths = [int(v) for v in argv[1:]] or [2048, 4096, 8192, 16384]
        sweep_banded_x(widths)
        return

    if argv and argv[0] == "halopallas":
        widths = [int(v) for v in argv[1:]] or [2048, 4096, 8192, 16384]
        sweep_halo_pallas(widths)
        return

    from aind_smartspim_destripe_tpu.ops import pallas_band, pallas_notch
    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig,
        build_plan,
        destripe_batch,
    )

    knob = argv[0]
    values = [int(v) for v in argv[1:]] or {
        "notch": [64, 128, 256],
        "k2col": [128, 256, 512],
        "k3col": [128, 256, 512],
        "k1rows": [256, 320, 512],
        "k4rows": [128, 160, 224],  # patches BOTH the bare (level>0) and
        # flat-epilogue (level 0) calls — big values overflow the flat one
        "blend": [32, 48, 64, 96],  # dual-band blend kernel rows_tile
        # (128 overflows scoped VMEM; timed on the DUAL step, not config 1)
        "deepotsu": [0, 1],  # batch the deep levels' Otsu into ONE folded
        # Pallas histogram call (DESTRIPE_DEEP_OTSU, round-5 tail A/B)
    }[knob]

    H, W, B = 1600, 2000, 64
    iters = 64  # matches bench.py's scan length: the baseline variant's
    # step_loop HLO is then identical to bench's and hits the compile cache
    from aind_smartspim_destripe_tpu.ops import dual_band, pallas_blend

    if knob == "blend":
        # the blend kernel only runs in the dual step — time that instead
        plan = dual_band._dual_plan(H, W, "db3", None, 256.0, 128.0, 12.0)
    else:
        plan = build_plan(
            H, W,
            FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
            FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
        )
    consts = jax.device_put(plan.constants())

    rng = np.random.default_rng(0)
    level = np.where(np.arange(B) % 2 == 0, 300.0, 3200.0)[:, None, None]
    base = np.clip(
        level
        + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(B, H, W)) * 10,
        0, 65535,
    ).astype(np.uint16)
    dev = jax.device_put(base)
    flat = jax.device_put(np.full((H, W), 1.2, np.float32))
    dark = jax.device_put(np.full((H, W), 4.0, np.float32))

    orig_notch = pallas_notch.notch_delta
    orig_any = pallas_band.an_y_pass
    orig_syny = pallas_band.syn_y_pass
    orig_anx = pallas_band.an_x_lowpass_log1p
    orig_synx = pallas_band.syn_x_exp
    orig_blend = pallas_blend.blend_smooth_mix

    def set_knob(v):
        if knob == "notch":
            pallas_notch.notch_delta = partial(orig_notch, rows_tile=v)
        elif knob == "k2col":
            pallas_band.an_y_pass = partial(orig_any, col_tile=v)
        elif knob == "k3col":
            pallas_band.syn_y_pass = partial(orig_syny, col_tile=v)
        elif knob == "k1rows":
            pallas_band.an_x_lowpass_log1p = partial(orig_anx, rows_tile=v)
        elif knob == "k4rows":
            pallas_band.syn_x_exp = partial(orig_synx, rows_tile=v)
        elif knob == "blend":
            # dual_band resolves the kernel through the module attr at
            # trace time, so patching the module is enough
            pallas_blend.blend_smooth_mix = partial(orig_blend, rows_tile=v)
        elif knob == "deepotsu":
            # read from the env at trace time (fresh closure per variant)
            os.environ["DESTRIPE_DEEP_OTSU"] = str(v)
        else:
            raise SystemExit(f"unknown knob {knob}")

    results = {}
    for v in values:
        set_knob(v)

        # fresh closure per variant: the patched module attribute must be
        # re-traced, not served from a previous variant's jit cache
        @partial(jax.jit, static_argnums=(0, 1))
        def step_loop(plan, n, images, flat, dark, consts):
            def body(tok, _):
                x, _tok = jax.lax.optimization_barrier((images, tok))
                if knob == "blend":
                    out = dual_band.dual_band_destripe_batch(
                        plan, x, 100.0, -1.0, consts=consts
                    )
                else:
                    out = destripe_batch(
                        plan, x, 2500.0, consts, flat=flat, dark=dark
                    )
                return out[0, 0, 0].astype(jnp.float32) + _tok, ()

            tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return tok

        try:
            _ = float(np.asarray(
                step_loop(plan, iters, dev, flat, dark, consts)
            ))  # compile + warm
            best = float("inf")
            for _rep in range(2):
                t0 = time.perf_counter()
                _ = float(np.asarray(
                    step_loop(plan, iters, dev, flat, dark, consts)
                ))
                best = min(best, time.perf_counter() - t0)
            ms = best / iters * 1e3
            mpix = iters * B * H * W / best / 1e6
            results[v] = ms
            print(f"{knob}={v}: {ms:.2f} ms/step  ({mpix:.0f} MPix/s)",
                  flush=True)
        except Exception as e:  # Mosaic VMEM overflow etc.
            results[v] = None
            print(f"{knob}={v}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})", flush=True)

    pallas_notch.notch_delta = orig_notch
    pallas_band.an_y_pass = orig_any
    pallas_band.syn_y_pass = orig_syny
    pallas_band.an_x_lowpass_log1p = orig_anx
    pallas_band.syn_x_exp = orig_synx

    ok = {v: ms for v, ms in results.items() if ms is not None}
    if ok:
        bv = min(ok, key=ok.get)
        print(f"best: {knob}={bv} at {ok[bv]:.2f} ms/step")


if __name__ == "__main__":
    main(sys.argv[1:])
