"""Blocked banded-operator Pallas kernels (ops/pallas_band.py) vs the dense
operator formulation, in interpreter mode on the CPU backend.

The kernels' bf16x3 accumulation is compared with tolerances matching
lax.Precision.HIGH (~2^-21 relative); the host-side blocking itself is
verified exactly in float64.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from aind_smartspim_destripe_tpu.ops import pallas_band as pb
from aind_smartspim_destripe_tpu.ops import wavelets as wv
from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    band_operators,
    band_spec,
    build_plan,
)

H, W = 640, 768  # small but band-feasible geometry (band_spec gate: >=560)


@pytest.fixture(scope="module")
def plan():
    cfg = FilterConfig(wavelet="db3", level=1, sigma=64, max_threshold=3)
    return build_plan(H, W, cfg, cfg)


@pytest.fixture(scope="module")
def spec(plan):
    s = band_spec(plan)
    assert s is not None
    return s


@pytest.fixture(scope="module")
def ops(plan):
    o = band_operators(plan)
    assert o is not None
    return o


def test_blocked_operator_is_exact(plan, spec):
    """Blocked windows reproduce the dense operator exactly (float64)."""
    L_h, L_w = plan.ladder[-1]
    Ax_lo = wv.analysis_operator(W, "db3")[:L_w]
    k1 = spec["k1"]
    blocks = pb.blocked_operator(Ax_lo, k1["r"], k1["w"], k1["starts"])
    v = np.random.default_rng(0).normal(size=(W,))
    want = Ax_lo.astype(np.float64) @ v
    got = np.zeros(k1["nc"] * k1["r"])
    vp = np.zeros(-(-W // 128) * 128)
    vp[:W] = v
    for c in range(k1["nc"]):
        s = k1["starts"][c]
        got[c * k1["r"] : (c + 1) * k1["r"]] = (
            blocks[c].astype(np.float64).T @ vp[s : s + k1["w"]]
        )
    np.testing.assert_allclose(got[:L_w], want, rtol=1e-12, atol=1e-12)

def test_host_split_reconstructs():
    rng = np.random.default_rng(7)
    a = rng.normal(size=(3, 16, 8)).astype(np.float32)
    hi, lo = pb.split_bf16_np(a)
    err = np.abs(hi.astype(np.float64) + lo.astype(np.float64) - a)
    assert err.max() <= np.abs(a).max() * 2.0**-16


def test_blocked_operator_rejects_uncovered_band():
    A = np.zeros((128, 512), dtype=np.float32)
    A[0, 300] = 1.0  # far outside window [0, 64)
    with pytest.raises(ValueError):
        pb.blocked_operator(A, 128, 64, (0,))


def test_an_x_lowpass_log1p_matches_dense(plan, spec, ops):
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 4000, size=(2, H, W)).astype(np.float32)
    Ax_lo = wv.analysis_operator(W, "db3")[:L_w]
    want = np.log(1.0 + x) @ Ax_lo.T
    got = np.asarray(
        pb.an_x_lowpass_log1p(
            jnp.asarray(x), ops["bk1"],
            spec["k1"]["starts"], L_w, rows_tile=320, interpret=True,
        )
    )
    assert got.shape == (2, H, L_w)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-4)


def test_an_x_uint16_input(plan, spec, ops):
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(5)
    x = rng.integers(0, 65535, size=(1, H, W), dtype=np.uint16)
    Ax_lo = wv.analysis_operator(W, "db3")[:L_w]
    want = np.log(1.0 + x.astype(np.float32)) @ Ax_lo.T
    got = np.asarray(
        pb.an_x_lowpass_log1p(
            jnp.asarray(x), ops["bk1"],
            spec["k1"]["starts"], L_w, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)


def test_an_y_pass_matches_dense(plan, spec, ops):
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, H, L_w)).astype(np.float32) * 3.0
    Ay = wv.analysis_operator(H, "db3")
    want_lo = np.einsum("ih,bhw->biw", Ay[:L_h], x)
    want_hi = np.einsum("ih,bhw->biw", Ay[L_h:], x)
    lo, hi = pb.an_y_pass(
        jnp.asarray(x), ops["bk2"],
        spec["k2"]["stride"], spec["k2"]["pad"], L_h, interpret=True,
    )
    assert lo.shape == (2, L_h, L_w) and hi.shape == (2, L_h, L_w)
    np.testing.assert_allclose(np.asarray(lo), want_lo, rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(hi), want_hi, rtol=2e-5, atol=2e-4)


def test_an_x_classifier_stats(plan, spec, ops):
    """cls_cut emits exact classifier partial sums over the raw planes."""
    from aind_smartspim_destripe_tpu.ops.filter import _classifier_cut_f32

    L_h, L_w = plan.ladder[-1]
    cut = _classifier_cut_f32(400.0, 20.0, 0.3)
    assert cut is not None
    rng = np.random.default_rng(10)
    x = rng.integers(0, 3000, size=(2, H, W), dtype=np.uint16)
    out, st = pb.an_x_lowpass_log1p(
        jnp.asarray(x), ops["bk1"], spec["k1"]["starts"], L_w,
        cls_cut=cut, interpret=True,
    )
    st = np.asarray(st)
    m = x.astype(np.float16) >= np.float16(383.25)  # the exact f16 cut
    xf = x.astype(np.float64)
    np.testing.assert_allclose(
        st[:, :, 0, 0].sum(1), m.sum(axis=(1, 2)), rtol=0)
    np.testing.assert_allclose(
        st[:, :, 0, 128].sum(1), (~m).sum(axis=(1, 2)), rtol=0)
    np.testing.assert_allclose(
        st[:, :, 0, 256].sum(1), np.where(m, xf, 0).sum(axis=(1, 2)),
        rtol=1e-6)
    np.testing.assert_allclose(
        st[:, :, 0, 384].sum(1), np.where(~m, xf, 0).sum(axis=(1, 2)),
        rtol=1e-6)
    # the band output is unchanged by the stats side channel
    ref = pb.an_x_lowpass_log1p(
        jnp.asarray(x), ops["bk1"], spec["k1"]["starts"], L_w,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_an_y_pass_stats(plan, spec, ops):
    """stats=True emits exact per-plane |cH| extrema alongside the bands."""
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, H, L_w)).astype(np.float32) * 3.0
    lo, hi, mm = pb.an_y_pass(
        jnp.asarray(x), ops["bk2"],
        spec["k2"]["stride"], spec["k2"]["pad"], L_h, stats=True,
        interpret=True,
    )
    got_min = np.min(np.asarray(mm)[:, :, 0, 0], axis=1)
    got_max = np.max(np.asarray(mm)[:, :, 0, 128], axis=1)
    a = np.abs(np.asarray(hi))
    np.testing.assert_allclose(got_min, a.min(axis=(1, 2)), rtol=0)
    np.testing.assert_allclose(got_max, a.max(axis=(1, 2)), rtol=0)


def test_syn_y_pass_matches_dense(plan, spec, ops):
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(3)
    corr = rng.normal(size=(2, L_h, L_w)).astype(np.float32)
    delta = rng.normal(size=(2, L_h, L_w)).astype(np.float32)
    Sy = wv.synthesis_operator(L_h, "db3")[:H]
    want = np.einsum(
        "ih,bhw->biw", Sy, np.concatenate([corr, delta], axis=1)
    )
    got = pb.syn_y_pass(
        jnp.asarray(corr), jnp.asarray(delta),
        ops["bk3_lo"], ops["bk3_hi"],
        spec["k3"]["stride"], spec["k3"]["pad"], H, interpret=True,
    )
    assert got.shape == (2, H, L_w)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-4)

    # coarsest level: corr=None drops the cA half
    want0 = np.einsum("ih,bhw->biw", Sy[:, L_h:], delta)
    got0 = pb.syn_y_pass(
        None, jnp.asarray(delta), None, ops["bk3_hi"],
        spec["k3"]["stride"], spec["k3"]["pad"], H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got0), want0, rtol=2e-5, atol=2e-4)


def test_syn_x_exp_matches_dense(plan, spec, ops):
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(4)
    stacked = (rng.normal(size=(2, H, L_w)) * 0.01).astype(np.float32)
    img = rng.uniform(0, 3000, size=(2, H, W)).astype(np.float32)
    Sx = wv.synthesis_operator(L_w, "db3")[:W, :L_w]
    corr = np.einsum("bhw,jw->bhj", stacked, Sx)
    want = np.exp(np.log(1.0 + img) + corr) + 1.0
    got = pb.syn_x_exp(
        jnp.asarray(stacked), jnp.asarray(img), ops["bk4"],
        spec["k4"]["starts"], W, interpret=True,
    )
    assert got.shape == (2, H, W) and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-2)


def test_syn_x_plain_matches_dense(plan, spec, ops):
    """images=None returns the bare correction (deeper-level synthesis)."""
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(8)
    stacked = (rng.normal(size=(2, H, L_w)) * 0.01).astype(np.float32)
    Sx = wv.synthesis_operator(L_w, "db3")[:W, :L_w]
    want = np.einsum("bhw,jw->bhj", stacked, Sx)
    got = pb.syn_x_exp(
        jnp.asarray(stacked), None, ops["bk4"],
        spec["k4"]["starts"], W, interpret=True,
    )
    assert got.shape == (2, H, W) and got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_level1_operators_and_chain():
    """Level-1 banded analysis (no log1p) matches the dense operators."""
    from aind_smartspim_destripe_tpu.ops.filter import _band_level_geometry

    cfg = FilterConfig(wavelet="db3", level=2, sigma=64, max_threshold=3)
    plan = build_plan(1280, 1280, cfg, cfg)  # level-1 input 643x643
    spec1 = band_spec(plan, 1)
    assert spec1 is not None
    ops1 = band_operators(plan, 1)
    h, w, lh, lw = _band_level_geometry(plan, 1)
    rng = np.random.default_rng(9)
    a = rng.normal(size=(2, h, w)).astype(np.float32)
    Ax_lo = wv.analysis_operator(w, "db3")[:lw]
    Ay = wv.analysis_operator(h, "db3")
    lox = a @ Ax_lo.T
    want_a = np.einsum("ih,bhw->biw", Ay[:lh], lox)
    want_ch = np.einsum("ih,bhw->biw", Ay[lh:], lox)
    lox_k = pb.an_x_lowpass_log1p(
        jnp.asarray(a), ops1["bk1"], spec1["k1"]["starts"], lw,
        log1p=False, interpret=True,
    )
    got_a, got_ch = pb.an_y_pass(
        lox_k, ops1["bk2"], spec1["k2"]["stride"], spec1["k2"]["pad"],
        lh, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got_a), want_a, rtol=3e-5,
                               atol=6e-4)
    np.testing.assert_allclose(np.asarray(got_ch), want_ch, rtol=3e-5,
                               atol=6e-4)

    # level-1 synthesis: K3 then plain K4 reconstructs S_y/S_x exactly
    corr = rng.normal(size=(2, lh, lw)).astype(np.float32)
    delta = rng.normal(size=(2, lh, lw)).astype(np.float32)
    Sy = wv.synthesis_operator(lh, "db3")[:h]
    Sx = wv.synthesis_operator(lw, "db3")[:w, :lw]
    want = np.einsum(
        "ih,bhw->biw", Sy, np.concatenate([corr, delta], axis=1)
    ) @ Sx.T
    st = pb.syn_y_pass(
        jnp.asarray(corr), jnp.asarray(delta), ops1["bk3_lo"],
        ops1["bk3_hi"], spec1["k3"]["stride"], spec1["k3"]["pad"], h,
        interpret=True,
    )
    got = pb.syn_x_exp(
        st, None, ops1["bk4"], spec1["k4"]["starts"], w, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=2e-3)


def test_composed_analysis_chain(plan, spec, ops):
    """K1 -> K2 equals the dense two-pass analysis of destripe_batch."""
    L_h, L_w = plan.ladder[-1]
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 2000, size=(1, H, W)).astype(np.float32)
    Ax_lo = wv.analysis_operator(W, "db3")[:L_w]
    Ay = wv.analysis_operator(H, "db3")
    lox = np.log(1.0 + x) @ Ax_lo.T
    want_a = np.einsum("ih,bhw->biw", Ay[:L_h], lox)
    want_ch = np.einsum("ih,bhw->biw", Ay[L_h:], lox)
    lox_k = pb.an_x_lowpass_log1p(
        jnp.asarray(x), ops["bk1"], spec["k1"]["starts"],
        L_w, interpret=True,
    )
    a, ch = pb.an_y_pass(
        lox_k, ops["bk2"], spec["k2"]["stride"],
        spec["k2"]["pad"], L_h, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(a), want_a, rtol=3e-5, atol=6e-4)
    np.testing.assert_allclose(np.asarray(ch), want_ch, rtol=3e-5, atol=6e-4)
