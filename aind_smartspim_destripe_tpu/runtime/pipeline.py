"""
Streaming destripe pipeline: Zarr slabs -> device batches -> Zarr, overlapped.

TPU-native replacement for the reference's producer/consumer process pool
(zarr_destriper.py:797-906, 1132-1172) and its external shared-memory data
loader (SURVEY.md L1b). One process, three overlapped stages:

  [reader threads]  decode input Zarr chunks for slab k+1..k+prefetch
        |           (native blosc codec drops the GIL -> real parallelism)
  [devices]         destripe+flatfield jit on fixed-size plane batches,
        |           sharded over ALL local chips via a 1-D z mesh (planes
        |           are independent — zero collectives); uint16 in / uint16
        |           out so PCIe traffic is halved, with JAX async dispatch
        |           double-buffering H2D/compute/D2H
  [writer threads]  encode+write level-0 chunks for slab k-1

The Z slab (default 64 planes) matches the reference's prediction chunk
(zarr_destriper.py:1256), so level-0 writes are chunk-aligned and race-free.

Adds what the reference lacks (SURVEY.md section 5 "Checkpoint / resume"): a
per-slab commit journal in the output store, so an interrupted run resumes
instead of recomputing the tile.
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.filter import DestripePlan, destripe_batch, wrap_cast
from ..ops.flatfield import flatfield_correction

__all__ = ["PipelineStats", "StreamingDestriper", "make_device_step"]


@dataclass
class PipelineStats:
    planes: int = 0
    slabs: int = 0
    slabs_skipped: int = 0
    read_s: float = 0.0
    compute_s: float = 0.0
    write_s: float = 0.0
    wall_s: float = 0.0
    pixels: int = 0
    # True when the device step sharded ROWS over the mesh (the Y-halo
    # route above DESTRIPE_HALO_THRESHOLD_BYTES) instead of planes
    halo: bool = False
    # per-slab records [(z0, z1, read_wait_s, compute_s)] — read_wait is
    # the time the loop BLOCKED on the prefetched read (0 when it overlapped
    # fully with the previous slab's compute); write seconds live on the
    # writer pool and are aggregated in write_s only
    slab_records: list = None

    def __post_init__(self):
        if self.slab_records is None:
            self.slab_records = []

    @property
    def gpix_per_s(self) -> float:
        return self.pixels / self.wall_s / 1e9 if self.wall_s else 0.0


def make_device_step(plan: DestripePlan, microscope_high_int: float,
                     with_flatfield: bool, devices=None, dual: bool = False,
                     crossover: float = 100.0, dual_threshold: float = -1.0):
    """Jitted (batch,H,W) uint16 -> uint16 device step: destripe then (when
    flats are provided) shadow-correct; otherwise a zarr-style wrap cast,
    matching the reference's float write into a uint16 store
    (zarr_destriper.py:336). The operator matrices live on device and enter
    the kernel as arguments (baking them into the graph as literals stalls
    the XLA compiler).

    ``dual=True`` replaces the classifier dispatch with the dual-band blend
    (BASELINE config 2, ops/dual_band.py): every plane gets BOTH of the
    plan's configs from one shared wavelet decomposition, blended per pixel
    by the smoothed sigmoid foreground fraction (``crossover`` width,
    ``dual_threshold`` center; < 0 = per-plane Otsu). The flat-field / wrap
    epilogue then applies to the blended plane.

    ``devices``: the accelerators to spread each batch over. With more than
    one, a 1-D ``z`` mesh shards the plane axis — the TPU equivalent of the
    reference's producer + ``co_cpus`` consumers (zarr_destriper.py:1136-1172):
    per-plane compute needs no cross-chip communication, so each chip runs
    the full kernel (Pallas programs included, via shard_map) on its shard.
    Flats and operator constants are replicated.

    When one plane is too large for a single chip (plane f32 bytes above
    ``DESTRIPE_HALO_THRESHOLD_BYTES``, default 1 GiB), the same mesh shards
    the ROW axis instead and the step runs the Y-halo-sharded kernel
    (parallel/halo.py): halo exchange over ICI per wavelet pass, coarse
    levels replicated, identical filter semantics on the dense math path.
    Dual-band composes with it (dual_band_destripe_y_sharded: both bands
    from one row-sharded decomposition, GSPMD-partitioned blend).

    The returned callable carries helpers for the caller's data placement:
    ``.put(chunk)`` shards/transfers a (B, H, W) numpy batch, ``.put_const``
    replicates per-tile constants, ``.n_devices`` the mesh size.
    """
    devices = list(devices) if devices is not None else []
    n_dev = max(1, len(devices))

    def local_step(images, flat, dark, consts):
        if dual:
            # Dual-band: blend first (both bands from one decomposition),
            # then the epilogue on the blended float plane — the fused
            # in-kernel epilogues below assume the single-band synthesis.
            from ..ops.dual_band import dual_band_destripe_batch

            blended = dual_band_destripe_batch(
                plan, images, crossover, dual_threshold, consts=consts
            )
            if with_flatfield:
                return flatfield_correction(blended, flat, dark)
            return wrap_cast(blended)
        # Epilogues fuse into the destripe kernel (on the Pallas band path
        # they run inside the final synthesis program — one less full-image
        # HBM round trip): flat-field correction when flats are provided,
        # else the zarr-store wrap cast (zarr_destriper.py:336 assigns the
        # unclipped float into a uint16 zarr, which wraps modulo 2**16 via
        # numpy astype; a bare XLA astype would saturate instead).
        if with_flatfield:
            return destripe_batch(
                plan, images, microscope_high_int, consts,
                flat=flat, dark=dark,
            )
        return destripe_batch(
            plan, images, microscope_high_int, consts, wrap=True
        )

    plane_bytes = plan.height * plan.width * 4
    halo_threshold = int(
        os.environ.get("DESTRIPE_HALO_THRESHOLD_BYTES", str(1 << 30))
    )
    if n_dev > 1 and plane_bytes > halo_threshold:
        return _make_halo_step(
            plan, microscope_high_int, with_flatfield, devices,
            dual=dual, crossover=crossover, dual_threshold=dual_threshold,
        )

    if n_dev == 1:
        consts = jax.device_put(plan.constants(), *devices[:1])

        @partial(jax.jit, donate_argnums=(0,))
        def step(images, flat, dark, consts):
            return local_step(images, flat, dark, consts)

        fn = lambda images, flat, dark: step(images, flat, dark, consts)
        fn.n_devices = 1
        fn.put = (
            (lambda chunk: jax.device_put(chunk, devices[0]))
            if devices else jnp.asarray
        )
        fn.put_const = fn.put
        return fn

    mesh = Mesh(np.asarray(devices), ("z",))
    in_spec = NamedSharding(mesh, P("z", None, None))
    rep = NamedSharding(mesh, P())
    consts = jax.device_put(plan.constants(), rep)

    @partial(jax.jit, donate_argnums=(0,), out_shardings=in_spec)
    def step(images, flat, dark, consts):
        return jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(P("z", None, None), P(), P(), P()),
            out_specs=P("z", None, None),
            # pallas_call outputs carry no varying-across-mesh annotation;
            # the body is per-plane (no collectives), so the vma analysis
            # has nothing to verify anyway
            check_vma=False,
        )(images, flat, dark, consts)

    fn = lambda images, flat, dark: step(images, flat, dark, consts)
    fn.n_devices = n_dev
    fn.put = lambda chunk: jax.device_put(chunk, in_spec)
    fn.put_const = lambda c: jax.device_put(c, rep)
    return fn


def _make_halo_step(plan, microscope_high_int, with_flatfield, devices,
                    dual=False, crossover=100.0, dual_threshold=-1.0):
    """Device step for beyond-single-chip planes: ROWS sharded over the 1-D
    z mesh via the halo-exchange kernel (parallel/halo.py). Same uint16 ->
    uint16 contract as the plane-sharded step; batches stay small (each
    plane's rows occupy the whole mesh). ``dual=True`` routes through the
    row-sharded dual-band form (both bands from one sharded decomposition,
    GSPMD-partitioned blend, epilogue on the blended plane)."""
    from ..parallel.halo import (
        banded_x_min_w_default,
        destripe_y_sharded,
        dual_band_destripe_y_sharded,
        halo_constants,
    )

    # Rows that don't divide the pool are handled by a pad -> crop
    # sandwich that keeps the NUMERICS on exactly H rows: put() zero-pads
    # the uint16 batch to the next mesh multiple (device_put requires an
    # evenly divisible sharded axis), the jitted step CROPS the pad off
    # before any math (so the symmetric boundary extension and the
    # per-plane classifier/Otsu statistics see the real plane), and pads
    # the output back for the even out_sharding. GSPMD partitions the
    # uneven intermediates itself; callers crop via ``fn.pad_rows``.
    n_dev = len(devices)
    H_rows = plan.height
    pad_rows = -(-H_rows // n_dev) * n_dev - H_rows
    mesh = Mesh(np.asarray(devices), ("z",))
    row_spec = NamedSharding(mesh, P(None, "z", None))
    rep = NamedSharding(mesh, P())
    # width-gate the x operators: beyond-threshold levels carry None and
    # the halo kernel runs them banded/spectral (O(1) operator memory)
    dense = plan.constants(
        dense_only=True, banded_x_min_w=banded_x_min_w_default()
    )
    halo_arrays, halo_static = halo_constants(
        plan, n_dev, notch_blocks=not dual
    )
    # The per-shard Pallas tier replaces the dense x matmuls wherever its
    # blocked K1/K4 operators exist — drop those dense operators from the
    # device constants (at 16k widths they are ~0.5 GB EACH of HBM). The
    # DESTRIPE_HALO_PALLAS=0 escape hatch then takes the banded/spectral
    # x fallback for those levels (the documented <=1 LSB
    # cross-formulation), not the dense matmuls.
    if "xk1" in halo_static:
        an_x = list(dense["an_x_lo"])
        for lvl in halo_static["xk1"]:
            an_x[lvl] = None
        dense["an_x_lo"] = tuple(an_x)
    if "xk4" in halo_static:
        syn_x = list(dense["syn_x_lo"])
        for i in halo_static["xk4"]:
            syn_x[i] = None
        dense["syn_x_lo"] = tuple(syn_x)
    # Likewise the dense compute-both-bands notch operators superseded by
    # the per-plane-selected chunked banks (halo_arrays["notch"], ~same
    # bytes as the dense cat they replace — keeping both would double the
    # dominant HBM constant). Single-band only: the dual step's static
    # band split multiplies the dense cat half-per-half already. Under
    # DESTRIPE_HALO_PALLAS=0 these levels then run the spectral notch (the
    # documented banded/spectral fallback, like the dropped x operators).
    # Interpret-mode (CI) runs KEEP the cat: geometries there are tiny and
    # the kill-switch twin then compares against the dense formulation —
    # XLA's CPU fft thunk also RET_CHECKs on the sharded production
    # layout (fft_thunk.cc IsMonotonicWithDim0Major), so the spectral
    # fallback is TPU-only in practice.
    from ..ops.pallas_env import interpret_forced

    if not dual and "notch" in halo_static and not interpret_forced():
        cat = list(dense["notch_cat"])
        for i in halo_static["notch"]:
            cat[i] = None
        dense["notch_cat"] = tuple(cat)
    consts = jax.device_put(dense, rep)
    harrs = jax.device_put(halo_arrays, rep)

    @partial(jax.jit, donate_argnums=(0,), out_shardings=row_spec)
    def step(images, flat, dark, consts, harrs):
        if pad_rows:
            images = images[:, :H_rows, :]  # crop BEFORE any math
        if dual:
            kw = dict(crossover=crossover, threshold=dual_threshold)
            if with_flatfield:
                out = dual_band_destripe_y_sharded(
                    images, mesh, plan, consts, harrs, halo_static,
                    flat=flat, dark=dark, **kw,
                )
            else:
                out = dual_band_destripe_y_sharded(
                    images, mesh, plan, consts, harrs, halo_static,
                    wrap=True, **kw,
                )
        elif with_flatfield:
            out = destripe_y_sharded(
                images, mesh, plan, consts, harrs, halo_static,
                microscope_high_int=microscope_high_int,
                flat=flat, dark=dark,
            )
        else:
            out = destripe_y_sharded(
                images, mesh, plan, consts, harrs, halo_static,
                microscope_high_int=microscope_high_int, wrap=True,
            )
        if pad_rows:
            out = jnp.pad(out, [(0, 0), (0, pad_rows), (0, 0)])
        return out

    def put(chunk):
        if pad_rows:
            chunk = np.pad(chunk, [(0, 0), (0, pad_rows), (0, 0)])
        return jax.device_put(chunk, row_spec)

    fn = lambda images, flat, dark: step(images, flat, dark, consts, harrs)
    fn.n_devices = n_dev
    fn.shards_rows = True  # batch need not divide the mesh; rows do
    fn.pad_rows = pad_rows  # crop fn(...)[:, :plan.height] when nonzero
    fn.put = put
    fn.put_const = lambda c: jax.device_put(c, rep)
    return fn


class _Journal:
    """Per-slab commit log enabling cheap resume (one JSON file in the output
    store; a slab is recomputed unless its exact geometry was committed)."""

    def __init__(self, path: str, meta: dict):
        self.path = path
        self.meta = meta
        self.done = set()
        # commit() runs on concurrent IO-pool writer threads; the lock keeps
        # the set/snapshot/replace sequence atomic (an unlocked sorted() can
        # see the set mutate mid-iteration, and two threads would race the
        # same .tmp path).
        self._lock = threading.Lock()
        if os.path.exists(path):
            try:
                with open(path) as f:
                    state = json.load(f)
                if state.get("meta") == meta:
                    self.done = set(map(tuple, state.get("slabs", [])))
            except (json.JSONDecodeError, OSError, TypeError,
                    AttributeError):
                # corrupt/foreign journal (wrong JSON shape included) means
                # recompute, never crash the resume path
                pass

    def commit(self, slab: tuple):
        with self._lock:
            self.done.add(slab)
            snapshot = sorted(self.done)
            tmp = self.path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"meta": self.meta, "slabs": snapshot}, f)
            os.replace(tmp, self.path)


class StreamingDestriper:
    """Drive one tile (3-D or 5-D Zarr array) through the device pipeline.

    Parameters mirror the knobs of the reference streaming path: ``slab``
    plays the role of prediction_chunksize's Z extent, ``prefetch`` the
    producer queue depth, ``device_batch`` the per-dispatch plane count.
    """

    def __init__(
        self,
        input_array,
        output_array,
        plan: DestripePlan,
        flatfield: Optional[np.ndarray] = None,
        darkfield: Optional[np.ndarray] = None,
        microscope_high_int: float = 2500.0,
        slab: int = 64,
        device_batch: int = 64,
        prefetch: int = 2,
        io_threads: int = 0,
        logger: Optional[logging.Logger] = None,
        journal: bool = True,
        devices=None,
        dual: bool = False,
        crossover: float = 100.0,
        dual_threshold: float = -1.0,
    ):
        self.inp = input_array
        self.out = output_array
        self.plan = plan
        self.high_int = microscope_high_int
        self.slab = slab
        # All visible accelerators by default: on a production v5e host one
        # process drives every local chip (the mesh replaces the reference's
        # consumer pool); pass an explicit 1-list to pin a single device.
        self.devices = (
            list(devices) if devices is not None else list(jax.local_devices())
        )
        n_dev = max(1, len(self.devices))
        self.prefetch = max(1, prefetch)
        self.logger = logger or logging.getLogger(__name__)
        self.io = ThreadPoolExecutor(
            max_workers=io_threads or min(16, (os.cpu_count() or 4))
        )

        in_shape = tuple(input_array.shape)
        if len(in_shape) == 5:
            if in_shape[:2] != (1, 1):
                # the streaming loop reads/writes [0, 0] only — accepting a
                # multi-T/C tile would silently leave every other channel
                # as fill-value zeros in the output store
                raise ValueError(
                    f"5-D input must be (1, 1, Z, Y, X); got {in_shape} — "
                    "destripe each channel's tile separately"
                )
            self._lead = (0, 0)
            self.zyx = in_shape[2:]
        elif len(in_shape) == 3:
            self._lead = ()
            self.zyx = in_shape
        else:
            raise ValueError(f"expected 3-D or 5-D input, got {in_shape}")
        if self.zyx[1:] != (plan.height, plan.width):
            raise ValueError(
                f"plan geometry {(plan.height, plan.width)} != data {self.zyx[1:]}"
            )

        self.with_flat = flatfield is not None
        h, w = plan.height, plan.width
        flat = np.asarray(flatfield, np.float32) if self.with_flat else np.ones((1, 1), np.float32)
        if self.with_flat and darkfield is not None:
            dark = np.asarray(darkfield, np.float32)[:h, :w]
        else:
            if darkfield is not None:
                # reference parity: the dark is only ever subtracted inside
                # the flat-field correction (filtering.py:338-380), so
                # without a flat it cannot apply — but say so, the caller
                # handed us one
                self.logger.warning(
                    "darkfield provided without a flatfield — dark "
                    "subtraction only applies inside the flat-field "
                    "correction; ignoring it (reference semantics)"
                )
            dark = np.zeros((1, 1), np.float32)
        if self.with_flat:
            if flat.shape[-2:] != (h, w):
                raise ValueError(f"flatfield shape {flat.shape} != plane {(h, w)}")
            if dark.shape[-2:] != (h, w):
                dark = np.broadcast_to(dark, (h, w)).copy()
        self._step = make_device_step(
            plan, microscope_high_int, self.with_flat, devices=self.devices,
            dual=dual, crossover=crossover, dual_threshold=dual_threshold,
        )
        # Plane-sharded step: round the compiled batch up so every shard
        # gets an equal plane count. The halo step shards ROWS instead —
        # rounding its batch to n_dev multiples would inflate memory by up
        # to n_dev-1 beyond-HBM planes per dispatch; its batch is instead
        # CAPPED so the per-device working set of one dispatch stays under
        # DESTRIPE_HALO_BATCH_BYTES (default 2 GiB). The ~8x factor is the
        # kernel's per-plane f32 footprint relative to one plane: x + xlog
        # + the coefficient/delta ladders + stacked synthesis temporaries
        # (parallel/halo.py operator-memory accounting).
        if getattr(self._step, "shards_rows", False):
            plane_dev = h * w * 4 / max(1, self._step.n_devices)
            budget = int(
                os.environ.get("DESTRIPE_HALO_BATCH_BYTES", str(2 << 30))
            )
            cap = max(1, int(budget / (8.0 * plane_dev)))
            self.device_batch = max(1, min(device_batch, cap))
        else:
            self.device_batch = -(-device_batch // n_dev) * n_dev
        self._flat = self._step.put_const(flat)
        self._dark = self._step.put_const(dark)

        meta = {
            "slab": slab,
            "zyx": list(self.zyx),
            "cells": str(plan.cells),
            "no_cells": str(plan.no_cells),
            "high_int": microscope_high_int,
            "with_flat": self.with_flat,
        }
        if self.with_flat:
            # resume correctness: a run resumed after the channel flats
            # were RE-ESTIMATED must not stitch slabs corrected with the
            # old fields to slabs corrected with the new ones — the journal
            # is keyed on the field CONTENT, not just the with_flat bool.
            # Key appears only with flats so older flatless journals keep
            # resuming.
            import hashlib

            sig = hashlib.sha1(flat.tobytes())
            sig.update(dark.tobytes())
            meta["flats_sha1"] = sig.hexdigest()
        if dual:
            # mode change invalidates the resume journal (exact-dict meta
            # compare): a dual-band slab is not interchangeable with a
            # classifier-dispatched one. Keys appear ONLY in dual mode so
            # pre-existing single-band journals keep resuming.
            meta.update({
                "dual": True,
                "crossover": float(crossover),
                "dual_threshold": float(dual_threshold),
            })
        self.journal = (
            _Journal(
                os.path.join(
                    getattr(output_array, "path", "."), ".destripe_journal.json"
                ),
                meta,
            )
            if journal and hasattr(output_array, "path")
            else None
        )

    # -- IO helpers --------------------------------------------------------
    # Bounded retries mirror the reference's NAS-flakiness handling
    # (destriper.py:167-191 reads, :202-215 writes).

    def _read_slab(self, z0: int, z1: int) -> np.ndarray:
        for attempt in range(3):
            try:
                if self._lead:
                    return np.asarray(self.inp[0, 0, z0:z1])
                return np.asarray(self.inp[z0:z1])
            except OSError:
                if attempt == 2:
                    raise
                self.logger.error(f"retrying read of slab {z0}:{z1}...")
                time.sleep(0.05)

    def _write_slab(self, z0: int, z1: int, data: np.ndarray):
        for attempt in range(10):
            try:
                if len(self.out.shape) == 5:
                    self.out[0:1, 0:1, z0:z1] = data[None, None]
                else:
                    self.out[z0:z1] = data
                return
            except OSError:
                if attempt == 9:
                    raise
                self.logger.error(f"retrying write of slab {z0}:{z1}...")
                time.sleep(0.05)

    # -- device ------------------------------------------------------------

    def _process_slab(self, data: np.ndarray) -> np.ndarray:
        """Destripe a (n,H,W) numpy slab via fixed-size device batches with
        async dispatch overlap; returns uint16 (n,H,W)."""
        n = data.shape[0]
        b = self.device_batch
        # halo steps with non-mesh-divisible rows return pad_rows extra
        # zero rows (even out_sharding); crop them off at conversion
        crop = getattr(self._step, "pad_rows", 0)
        rows = data.shape[1]
        outs = []
        pending = deque()
        for i in range(0, n, b):
            chunk = data[i : i + b]
            if chunk.shape[0] < b:  # pad tail to the compiled batch size
                pad = np.zeros((b - chunk.shape[0],) + chunk.shape[1:], chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            dev = self._step.put(np.ascontiguousarray(chunk))
            pending.append((i, min(b, n - i), self._step(dev, self._flat, self._dark)))
            # keep at most 2 dispatches in flight (double buffering)
            while len(pending) > 2:
                j, k, res = pending.popleft()
                arr = np.asarray(res)[:k]
                outs.append((j, arr[:, :rows] if crop else arr))
        while pending:
            j, k, res = pending.popleft()
            arr = np.asarray(res)[:k]
            outs.append((j, arr[:, :rows] if crop else arr))
        outs.sort(key=lambda t: t[0])
        return np.concatenate([o for _, o in outs], axis=0)

    # -- main loop ---------------------------------------------------------

    def run(self) -> PipelineStats:
        stats = PipelineStats(halo=getattr(self._step, "shards_rows", False))
        t_start = time.time()
        Z, H, W = self.zyx
        slabs = [(z0, min(z0 + self.slab, Z)) for z0 in range(0, Z, self.slab)]

        read_q: deque = deque()
        writes: deque[Future] = deque()
        # Backpressure: each in-flight write pins a full uint16 slab (~400 MB
        # at production geometry); without a bound, a slow store turns the
        # pipeline into an OOM. Mirrors the reference's bounded queue
        # (zarr_destriper.py:1136-1138).
        max_inflight_writes = self.prefetch + 1
        next_read = 0

        def schedule_reads():
            nonlocal next_read
            while next_read < len(slabs) and len(read_q) < self.prefetch:
                z0, z1 = slabs[next_read]
                if self.journal and (z0, z1) in self.journal.done:
                    read_q.append(((z0, z1), None))
                else:
                    read_q.append(
                        ((z0, z1), self.io.submit(self._read_slab, z0, z1))
                    )
                next_read += 1

        schedule_reads()
        try:
            self._run_slabs(stats, read_q, writes, schedule_reads,
                            max_inflight_writes, H, W)
        except BaseException:
            # mid-tile failure: stop queued prefetch reads / writes from
            # racing the store after the error has propagated (started
            # writes still finish — they are atomic per chunk file)
            self.io.shutdown(wait=True, cancel_futures=True)
            raise
        for wfut in writes:
            stats.write_s += wfut.result()
        # one pool per tile: leave nothing parked once the tile is done
        # (destripe_channel builds hundreds of these)
        self.io.shutdown(wait=True)
        stats.wall_s = time.time() - t_start
        self.logger.info(
            f"pipeline done: {stats.planes} planes in {stats.wall_s:.2f}s "
            f"({stats.gpix_per_s:.3f} GPix/s) read={stats.read_s:.1f}s "
            f"compute={stats.compute_s:.1f}s write={stats.write_s:.1f}s "
            f"skipped={stats.slabs_skipped}"
        )
        return stats

    def _run_slabs(self, stats, read_q, writes, schedule_reads,
                   max_inflight_writes, H, W):
        while read_q:
            (z0, z1), item = read_q.popleft()
            schedule_reads()
            if item is None:
                stats.slabs_skipped += 1
                self.logger.info(f"slab {z0}:{z1} already committed; skipping")
                continue
            # read_s measures only the time the pipeline BLOCKS on the read
            # (clock starts at the wait, not at submit): a future that went
            # ready while the previous slab was computing costs ~0, so the
            # per-stage numbers are honest measures rather than upper bounds
            t0 = time.time()
            data = item.result()
            read_wait = time.time() - t0
            stats.read_s += read_wait

            t0 = time.time()
            out = self._process_slab(data)
            compute = time.time() - t0
            stats.compute_s += compute
            stats.slab_records.append((z0, z1, read_wait, compute))

            def write(z0=z0, z1=z1, out=out):
                # clock starts when the writer thread picks the job up, so
                # write_s is store-encode seconds, not pool queue depth
                t0 = time.time()
                self._write_slab(z0, z1, out)
                if self.journal:
                    self.journal.commit((z0, z1))
                return time.time() - t0

            writes.append(self.io.submit(write))
            while len(writes) > max_inflight_writes:
                stats.write_s += writes.popleft().result()
            stats.slabs += 1
            stats.planes += z1 - z0
            stats.pixels += (z1 - z0) * H * W
            self.logger.info(f"slab {z0}:{z1} destriped ({z1 - z0} planes)")
