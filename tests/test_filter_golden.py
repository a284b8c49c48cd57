"""
End-to-end numerical fidelity of the JAX destripe kernel vs the numpy/scipy
golden oracle (tests/golden/numpy_ref.py), which re-derives the reference
filtering.py pipeline including its quirks (packed-format FFTPACK notch,
float16 classifier, exp(y)+1 inverse).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aind_smartspim_destripe_tpu.ops import fft_notch, otsu
from aind_smartspim_destripe_tpu.ops.filter import (
    FilterConfig,
    build_plan,
    classify_planes,
    destripe_batch,
    log_space_fft_filtering,
)
from aind_smartspim_destripe_tpu.ops.flatfield import (
    flatfield_correction,
    get_hemisphere_flatfield,
    invert_image,
    normalize_image,
)
from tests.golden import numpy_ref as G


def synthetic_plane(h, w, stripe_amp=80.0, base=300.0, seed=0, cells=False):
    """A light-sheet-like plane: smooth background + horizontal stripes
    (+ bright blobs when cells=True)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = base + 400 * np.exp(-((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (2 * (h / 4) ** 2))
    img = img + (rng.normal(size=(h, 1)) * stripe_amp) * np.ones((1, w))
    img = img + rng.normal(size=(h, w)) * 15
    if cells:
        for _ in range(25):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            img += 6000 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * 3.0**2))
    return np.clip(img, 0, 65535).astype(np.float32)


# ---------------------------------------------------------------------------
# Sub-kernels
# ---------------------------------------------------------------------------


def test_notch_matches_closed_form():
    g = fft_notch.notch(64, 8.0)
    x = np.arange(64)
    np.testing.assert_allclose(g, 1 - np.exp(-(x**2) / (2 * 64.0)), atol=1e-12)
    with pytest.raises(ValueError):
        fft_notch.notch(0, 1.0)
    with pytest.raises(ValueError):
        fft_notch.notch(10, -1.0)
    gm = fft_notch.gaussian_filter((5, 32), 4.0)
    assert gm.shape == (5, 32)
    np.testing.assert_allclose(gm[0], gm[4])


@pytest.mark.parametrize("n", [12, 20, 67, 129, 254, 503])
def test_packed_notch_matrix_equals_fftpack(n):
    """x @ B.T must equal fftpack.irfft(fftpack.rfft(x) * g) exactly —
    this is the FFTPACK packed-format equivalence, the top risk item."""
    from scipy import fftpack

    rng = np.random.default_rng(n)
    x = rng.normal(size=(7, n))
    sigma = 0.17 * n
    g = G.notch_ref(n, sigma)
    want = fftpack.irfft(fftpack.rfft(x, axis=-1) * g, axis=-1)
    B = fft_notch.packed_notch_matrix(n, sigma)
    got = x @ B.T
    np.testing.assert_allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_otsu_matches_skimage_formula(seed):
    rng = np.random.default_rng(seed)
    # bimodal data like squared wavelet coefficients
    x = np.concatenate(
        [np.abs(rng.normal(0, 1, 4000)), np.abs(rng.normal(8, 2, 800))]
    ) ** 2
    x = x.astype(np.float32).reshape(60, 80)
    want = G.threshold_otsu_ref(x)
    got = float(otsu.threshold_otsu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_otsu_constant_input():
    x = jnp.full((16, 16), 3.5)
    assert float(otsu.threshold_otsu(x)) == pytest.approx(3.5)


# ---------------------------------------------------------------------------
# Classifier
# ---------------------------------------------------------------------------


def test_classifier_matches_reference():
    no_cells = synthetic_plane(64, 80, cells=False)
    cells = synthetic_plane(64, 80, cells=True, seed=3)
    batch = jnp.asarray(np.stack([no_cells, cells]))
    is_cells = np.asarray(classify_planes(batch, 2500.0))

    for img, got in zip([no_cells, cells], is_cells):
        fg, bg, _ = G.foreground_background_mean_ref(img)
        want = fg > bg and fg > 2500
        assert bool(got) == bool(want)


# ---------------------------------------------------------------------------
# Full filter vs golden
# ---------------------------------------------------------------------------


def psnr(a, b, peak=65535.0):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(peak**2 / mse) if mse > 0 else np.inf


@pytest.mark.parametrize(
    "shape,cells", [((100, 100), False), ((160, 200), False), ((160, 200), True)]
)
def test_destripe_matches_golden(shape, cells):
    img = synthetic_plane(*shape, cells=cells, seed=5)
    cfg_cells = dict(wavelet="db3", level=None, sigma=64, max_threshold=3)
    cfg_no = dict(wavelet="db3", level=None, sigma=128, max_threshold=12)

    want = G.filter_stripes_ref(img, cfg_no, cfg_cells, microscope_high_int=2500)

    plan = build_plan(
        shape[0], shape[1],
        FilterConfig.from_dict(cfg_cells), FilterConfig.from_dict(cfg_no),
    )
    got = np.asarray(destripe_batch(plan, jnp.asarray(img[None]), 2500.0))[0]

    assert got.shape == img.shape
    # fp32 kernel vs float64 oracle: demand near-machine agreement relative
    # to the uint16 dynamic range.
    u16_got = np.clip(got, 0, 65535).astype(np.uint16)
    u16_want = np.clip(want, 0, 65535).astype(np.uint16)
    p = psnr(u16_got, u16_want)
    assert p > 80, f"PSNR vs golden too low: {p:.1f} dB"


def test_destripe_removes_stripes():
    # Background constant along y (pure x-gradient) so the variance of row
    # means isolates horizontal stripe energy.
    rng = np.random.default_rng(9)
    h, w = 160, 200
    base = 300 + 2.0 * np.arange(w)[None, :] * np.ones((h, 1))
    img = base + (rng.normal(size=(h, 1)) * 120.0) * np.ones((1, w))
    img = np.clip(img, 0, 65535).astype(np.float32)
    out = log_space_fft_filtering(img, wavelet="db3", level=None, sigma=128,
                                  max_threshold=12)
    before = np.var(img.mean(axis=1))
    after = np.var(out.mean(axis=1))
    assert after < before / 4, (before, after)


def test_log_space_filtering_small_image_passthrough():
    """4x4 image: level 0 -> exp(log(1+x)) + 1 = x + 2 (reference edge case,
    test_filtering.py:171-180 analog)."""
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = log_space_fft_filtering(img, wavelet="db3", level=None)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img + 2.0, rtol=1e-4, atol=1e-3)
    assert np.all(out > 0)


def test_batched_matches_per_plane():
    imgs = np.stack(
        [synthetic_plane(100, 100, seed=s, cells=(s % 2 == 1)) for s in range(3)]
    )
    cfg_c = FilterConfig(sigma=64, max_threshold=3)
    cfg_n = FilterConfig(sigma=128, max_threshold=12)
    plan = build_plan(100, 100, cfg_c, cfg_n)
    batch_out = np.asarray(destripe_batch(plan, jnp.asarray(imgs), 2500.0))
    for i in range(3):
        single = np.asarray(
            destripe_batch(plan, jnp.asarray(imgs[i : i + 1]), 2500.0)
        )[0]
        np.testing.assert_allclose(batch_out[i], single, rtol=1e-5, atol=1e-2)


# ---------------------------------------------------------------------------
# Flat-field application (exact reference expectations)
# ---------------------------------------------------------------------------


def test_flatfield_correction_exact_uint16():
    """Mirror of the reference's exact unit expectation
    (tests/test_filtering.py:226-240 asserts [[4, 9], [14, 19]])."""
    image = np.array([[10.0, 20.0], [30.0, 40.0]])
    flatfield = np.full((2, 2), 2.0)
    darkfield = np.full((2, 2), 1.0)
    out = np.asarray(flatfield_correction(image, flatfield, darkfield))
    np.testing.assert_array_equal(out, np.array([[4, 9], [14, 19]], dtype=np.uint16))
    assert out.dtype == np.uint16


def test_flatfield_correction_clamps_darkfield():
    image = np.array([[0.5, 100.0]])
    flat = np.ones((1, 2))
    dark = np.array([[1.0, 1.0]])
    out = np.asarray(flatfield_correction(image, flat, dark))
    np.testing.assert_array_equal(out, [[0, 99]])


def test_flatfield_correction_shape_validation():
    with pytest.raises(ValueError):
        flatfield_correction(np.ones((4, 4)), np.ones((2, 2)), np.ones((4, 4)))
    with pytest.raises(ValueError):
        flatfield_correction(np.ones((4, 4)), np.ones((4, 4)), np.ones((2, 2)))


def test_flatfield_matches_golden_on_floats():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 5000, size=(32, 40)).astype(np.float32)
    flat = rng.uniform(1.0, 2.0, size=(32, 40)).astype(np.float32)
    dark = rng.uniform(0, 200, size=(40, 48)).astype(np.float32)  # larger: cropped
    want = G.flatfield_correction_ref(img, flat, dark)
    got = np.asarray(flatfield_correction(img, flat, dark))
    assert np.mean(got == want) > 0.999  # allow fp32-vs-64 edge rounding


def test_normalize_image_range_and_f16():
    rng = np.random.default_rng(1)
    imgs = rng.uniform(100, 900, size=(2, 16, 16))
    out = np.asarray(normalize_image(imgs))
    assert out.min() >= 1.0 and out.max() <= 2.0
    assert out.dtype == np.float16
    # reference: ratio rounded to f16 BEFORE the +1
    want = 1 + ((imgs - imgs.min()) / (imgs.max() - imgs.min())).astype(np.float16)
    np.testing.assert_array_equal(out, want.astype(np.float16))


def test_invert_image():
    img = np.array([[1.0, 5.0], [2.0, 3.0]])
    np.testing.assert_array_equal(np.asarray(invert_image(img)), [[4.0, 0.0], [3.0, 2.0]])


def test_hemisphere_flatfield_lookup():
    flats = [np.zeros((2, 2)), np.ones((2, 2))]
    cfg = {"471320": {"461360": 1}}
    out = get_hemisphere_flatfield("471320_461360", cfg, flats, zarr=True)
    np.testing.assert_array_equal(out, flats[1])
    out = get_hemisphere_flatfield("/x/471320_461360/file.tif", cfg, flats, zarr=False)
    np.testing.assert_array_equal(out, flats[1])
    with pytest.raises(KeyError):
        get_hemisphere_flatfield("999999_461360", cfg, flats)
    with pytest.raises(KeyError):
        get_hemisphere_flatfield("471320_999999", cfg, flats)


def test_destripe_with_db2_wavelet():
    """Non-default wavelet through the full kernel vs the golden oracle."""
    img = synthetic_plane(80, 96, seed=11)
    cfg = dict(wavelet="db2", level=2, sigma=64, max_threshold=6)
    want = G.log_space_fft_filtering_ref(
        img.astype(np.float64), wavelet_name="db2", level=2, sigma=64,
        max_threshold=6,
    )
    got = log_space_fft_filtering(img, **cfg)
    u16g = np.clip(got, 0, 65535).astype(np.uint16)
    u16w = np.clip(want, 0, 65535).astype(np.uint16)
    assert psnr(u16g, u16w) > 80


def test_destripe_geometry_wavelet_fuzz():
    """Randomized geometry x wavelet-order x level sweep of the full kernel
    vs the float64 oracle: odd/even dims, tiny through mid sizes, db1..db6,
    fixed and auto level. Pins the static shape bookkeeping (dwt_coeff_len
    ladders, operator trims, notch sizes) where off-by-ones would live."""
    rng = np.random.default_rng(2024)
    for case in range(8):
        h = int(rng.integers(24, 190))
        w = int(rng.integers(24, 190))
        order = int(rng.integers(1, 7))
        wavelet = f"db{order}"
        # auto level half the time; else a small fixed level that the
        # geometry supports (>=1)
        level = None if case % 2 == 0 else int(rng.integers(1, 3))
        sigma = float(rng.choice([32, 64, 128]))
        max_threshold = float(rng.choice([3, 6, 12]))
        img = synthetic_plane(h, w, seed=100 + case)

        want = G.log_space_fft_filtering_ref(
            img.astype(np.float64), wavelet_name=wavelet, level=level,
            sigma=sigma, max_threshold=max_threshold,
        )
        got = log_space_fft_filtering(
            img, wavelet=wavelet, level=level, sigma=sigma,
            max_threshold=max_threshold,
        )
        assert got.shape == img.shape, (h, w, wavelet, level)
        # Odd-dimension divergence, by design: pywt's waverec2 (and so the
        # reference, filtering.py:221 — it never crops) returns a plane one
        # pixel larger per odd axis; this kernel folds the crop to the
        # input shape into the trimmed synthesis operator (the overlapping
        # region is identical — cropping after synthesis == trimming
        # operator rows). Production planes are even-sized; for odd ones
        # same-shape-out is the only contract the writers can store.
        want = want[: img.shape[0], : img.shape[1]]
        u16g = np.clip(got, 0, 65535).astype(np.uint16)
        u16w = np.clip(want, 0, 65535).astype(np.uint16)
        p = psnr(u16g, u16w)
        assert p > 75, (
            f"case {case}: {h}x{w} {wavelet} level={level} "
            f"sigma={sigma} thr={max_threshold}: PSNR {p:.1f} dB"
        )


def test_normalize_flat_dark_scalar_and_row_dark():
    """Review-derived: a scalar or 1-D dark broadcasts instead of dying in
    the 2-axis reference crop (the paired-check error message itself
    suggests passing a trivial dark)."""
    import jax.numpy as jnp

    from aind_smartspim_destripe_tpu.ops.filter import normalize_flat_dark

    flat = jnp.ones((6, 8), jnp.float32)
    for dark in (0.0, jnp.zeros((8,), jnp.float32),
                 jnp.zeros((1, 1), jnp.float32)):
        f, d = normalize_flat_dark(6, 8, flat, dark)
        assert f.shape == (6, 8) and d.shape == (6, 8)
        assert float(jnp.max(jnp.abs(d))) == 0.0
