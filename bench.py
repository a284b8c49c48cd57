"""
Benchmark: destripe throughput on one TPU chip, production SmartSPIM geometry.

Measures the fused destripe + flat-field device step (uint16 in / uint16 out)
on (B, 1600, 2000) planes with the production filter configs
(run_capsule.py:374-390 of the reference). Scope: DEVICE-RESIDENT — the
timed loop is a lax.scan chained on device, so host<->device transfer is NOT
included (the dev harness reaches the chip over a ~25 MB/s tunnel that no
production deployment has; see benchmarks/run_configs.py for the
IO-inclusive end-to-end configs and BENCH_E2E.md for their recorded numbers).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MPix/s/chip", "vs_baseline": N}
vs_baseline is against the 2 GPix/s/chip north-star target (BASELINE.md) —
the reference itself publishes no numbers.
"""

import json
import time

import numpy as np


def _probe_devices(timeout_s: float = 180.0):
    """Fail fast (clear message, exit 1) when the TPU tunnel is down.

    jax.devices() over a dead axon tunnel blocks forever with no error;
    probing it on a daemon thread bounds the wait so a driver-run bench
    reports the outage instead of hanging the round."""
    import threading

    box = {}

    def probe():
        import jax

        box["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in box:
        raise SystemExit(
            f"bench: no JAX devices after {timeout_s:.0f}s — TPU tunnel "
            "down? (jax.devices() never returned)"
        )
    return box["devices"]


def main():
    _probe_devices()

    import jax
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.runtime import enable_compile_cache

    enable_compile_cache()

    from aind_smartspim_destripe_tpu.ops.filter import (
        FilterConfig,
        build_plan,
        destripe_batch,
    )
    from aind_smartspim_destripe_tpu.ops.flatfield import flatfield_correction

    H, W = 1600, 2000
    B = int(__import__("os").environ.get("BENCH_BATCH", "64"))
    # enough chained iterations that the single dispatch RTT (~35 ms over
    # the dev tunnel) amortizes below ~0.5% of the measurement
    iters = int(__import__("os").environ.get("BENCH_ITERS", "64"))

    plan = build_plan(
        H, W,
        FilterConfig(wavelet="db3", level=None, sigma=64, max_threshold=3),
        FilterConfig(wavelet="db3", level=None, sigma=128, max_threshold=12),
    )

    from functools import partial

    consts = jax.device_put(plan.constants())

    @partial(jax.jit, static_argnums=(0,))
    def step(plan, images, flat, dark, consts):
        return destripe_batch(
            plan, images, 2500.0, consts, flat=flat, dark=dark
        )

    @partial(jax.jit, static_argnums=(0, 1))
    def step_loop(plan, n, images, flat, dark, consts):
        """n chained steps in ONE dispatch (lax.scan): measures pure device
        throughput — the dev harness adds ~35 ms of tunnel RTT per dispatch,
        which a production host never sees. The carry is a scalar token (the
        real input rides through an optimization barrier so each iteration
        re-executes): carrying the full uint16 output costs a 245 MB
        buffer copy per iteration (trace-measured 1.27 ms) that production
        — where every slab arrives in its own buffer — never pays."""

        def body(tok, _):
            x, _tok = jax.lax.optimization_barrier((images, tok))
            out = destripe_batch(
                plan, x, 2500.0, consts, flat=flat, dark=dark
            )
            return out[0, 0, 0].astype(jnp.float32) + _tok, ()

        tok, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return tok

    rng = np.random.default_rng(0)
    # alternate dim/bright planes so both classifier branches (no-cells /
    # cells, filtering.py:462) appear in the PSNR sample
    level = np.where(np.arange(B) % 2 == 0, 300.0, 3200.0)[:, None, None]
    base = np.clip(
        level
        + (rng.normal(size=(B, H, 1)) * 60) * np.ones((1, 1, W))
        + rng.normal(size=(B, H, W)) * 10,
        0,
        65535,
    ).astype(np.uint16)
    flat = jax.device_put(np.full((H, W), 1.2, np.float32))
    dark = jax.device_put(np.full((H, W), 4.0, np.float32))

    # Device-resident steady state: the streaming pipeline overlaps
    # host<->device transfers with compute, so the sustainable rate is set by
    # the kernel itself (and by PCIe on a locally-attached chip; the dev
    # harness reaches this chip over a network tunnel whose ~30 ms RTT and
    # ~25 MB/s bandwidth are not representative of production IO). All
    # iterations are dispatched asynchronously and synced once at the end —
    # PJRT queues them back-to-back on device, so wall time = N*step + 1 RTT.
    dev = jax.device_put(base)
    out = step(plan, dev, flat, dark, consts)
    out.block_until_ready()
    # force full materialization once (guards against lazy async backends)
    _ = np.asarray(out[0, :2, :2])

    looped = step_loop(plan, iters, dev, flat, dark, consts)
    _ = float(np.asarray(looped))  # compile + warm

    # Optional device trace of the timed loop (summarize the .xplane.pb with
    # benchmarks/trace_sum.py <file> <iters>); tracing adds overhead, so the
    # reported timing below is from the traced run only when the hook is on.
    trace_dir = __import__("os").environ.get("DESTRIPE_TRACE_DIR")
    from aind_smartspim_destripe_tpu.runtime.tracing import device_trace

    with device_trace(trace_dir):
        t0 = time.perf_counter()
        looped = step_loop(plan, iters, dev, flat, dark, consts)
        _ = float(np.asarray(looped))
        dt = time.perf_counter() - t0

    pixels = iters * B * H * W
    mpix_s = pixels / dt / 1e6

    # Fidelity evidence: PSNR of the uint16 device output vs the float64
    # numpy/scipy re-derivation of the reference pipeline, over a sample of
    # planes (dim/bright/striped variants — not just one synthetic case).
    psnr_db = None
    psnr_planes = []
    try:
        import sys

        sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.abspath(__file__)))
        from tests.golden import numpy_ref as G

        n_sample = min(4, B)
        got_all = np.asarray(out[:n_sample])
        for i in range(n_sample):
            plane = np.asarray(base[i], dtype=np.float64)
            want_f = G.filter_stripes_ref(
                plane,
                {"wavelet": "db3", "level": None, "sigma": 128, "max_threshold": 12},
                {"wavelet": "db3", "level": None, "sigma": 64, "max_threshold": 3},
                microscope_high_int=2500,
            )
            want = G.flatfield_correction_ref(
                want_f, np.full((H, W), 1.2), np.full((H, W), 4.0)
            )
            mse = np.mean(
                (got_all[i].astype(np.float64) - want.astype(np.float64)) ** 2
            )
            psnr_planes.append(
                round(10 * np.log10(65535.0**2 / mse), 1) if mse > 0 else 999.0
            )
        psnr_db = min(psnr_planes)
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "destripe_throughput_1600x2000_u16",
                "value": round(mpix_s, 1),
                "unit": "MPix/s/chip",
                "vs_baseline": round(mpix_s / 2000.0, 3),
                "scope": "device_resident",
                "psnr_vs_reference_db": psnr_db,
                "psnr_planes_db": psnr_planes,
            }
        )
    )


if __name__ == "__main__":
    main()
