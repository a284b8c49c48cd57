"""
Independent float64 numpy oracle for the BaSiC shading model
(models/basic.py; Peng et al., Nat. Commun. 2017).

BaSiCPy itself is not installable in this runtime (no package, no network),
so cross-implementation evidence comes from THIS re-derivation: the same
published model and update equations, implemented independently — numpy
float64 with explicit Python loops vs the package's float32 jax.lax
while_loop — so JAX-specific failure modes (resize/DCT/while_loop
semantics, precision) decorrelate from oracle bugs. The test gates
field-level agreement between the two AND ground-truth recovery of both.

Model:  I_i(x) = b_i * S(x) + D(x) + R_i(x)
Fit:    min ||W o R||_1 + lam_s ||DCT(S)||_1  via inexact augmented
        Lagrangian with L1 reweighting (LADMAP family).
"""

from __future__ import annotations

import numpy as np
from scipy import fft as sfft


def _shrink(x, t):
    return np.sign(x) * np.maximum(np.abs(x) - t, 0.0)


def _dct2(x):
    return sfft.dctn(x, type=2, norm="ortho")


def _idct2(x):
    return sfft.idctn(x, type=2, norm="ortho")


def ladmap_fit_ref(images, weight, smoothness_flatfield, max_iterations=100,
                   tol=1e-4):
    """Inner LADMAP solve at fixed weights, multiplicative model
    I_i = b_i * S + R_i (float64). Returns (S, b, R)."""
    images = np.asarray(images, np.float64)
    weight = np.asarray(weight, np.float64)
    n = images.shape[0]

    im_mean = images.mean(axis=0)
    norm = np.linalg.norm(images.ravel())
    mu = 12.5 / max(norm, 1e-6)
    rho, mu_max = 1.5, mu * 1e7
    lam_s = smoothness_flatfield * max(norm, 1e-6) / 400.0

    S = im_mean / max(im_mean.mean(), 1e-6)
    b = images.reshape(n, -1).mean(axis=1)
    R = np.zeros_like(images)
    Y = np.zeros_like(images)

    for _ in range(max_iterations):
        fit = b[:, None, None] * S[None]
        old = fit + R

        resid = images - fit - R + Y / mu
        b_sq = float(np.sum(b * b)) + 1e-6
        gS = np.sum(b[:, None, None] * resid, axis=0) / b_sq
        S = _idct2(_shrink(_dct2(S + gS), lam_s / (mu * b_sq)))

        S_sq = float(np.sum(S * S)) + 1e-6
        b = np.sum(S[None] * (images - R + Y / mu), axis=(1, 2)) / S_sq

        fit = b[:, None, None] * S[None]
        R = _shrink(images - fit + Y / mu, weight / mu)

        Y = Y + mu * (images - fit - R)
        mu = min(mu * rho, mu_max)

        diff = np.linalg.norm((fit + R - old).ravel()) / (
            np.linalg.norm(old.ravel()) + 1e-6
        )
        if diff <= tol:
            break
    return S, b, R


def estimate_darkfield_ref(images, S, b, smoothness_darkfield):
    """Per-pixel intercept regression of I_i(x) on b_i (content-masked by a
    5-MAD gate), DCT-smoothed, anchored by the dark-floor prior
    min(D) ~ 0 via the 0.99-quantile of -(smooth / S)."""
    images = np.asarray(images, np.float64)
    S = np.asarray(S, np.float64)
    b = np.asarray(b, np.float64)

    resid = images - b[:, None, None] * S[None]
    med = np.median(resid, axis=0)
    mad = np.median(np.abs(resid - med[None]), axis=0) + 1e-3
    w = (np.abs(resid - med[None]) < 5.0 * mad[None]).astype(np.float64)
    wsum = w.sum(axis=0) + 1e-6
    b_w = (w * b[:, None, None]).sum(axis=0) / wsum
    i_w = (w * images).sum(axis=0) / wsum
    db = b[:, None, None] - b_w[None]
    cov = (w * db * (images - i_w[None])).sum(axis=0) / wsum
    var = (w * db * db).sum(axis=0) / wsum + 1e-6
    slope = cov / var
    intercept = i_w - slope * b_w
    smooth = _idct2(_shrink(_dct2(intercept), smoothness_darkfield))
    c = np.quantile(-(smooth / np.maximum(S, 1e-3)), 0.99)
    return np.maximum(smooth + c * S, 0.0)


def basic_fit_ref(
    images,
    fitting_weight=None,
    get_darkfield=False,
    smoothness_flatfield=1.0,
    smoothness_darkfield=20.0,
    sort_intensity=False,
    max_reweight_iterations=10,
    max_iterations=100,
    epsilon=0.1,
    reweight_tol=1e-3,
    optimization_tol=1e-4,
):
    """Full reweighted fit at the input resolution (the oracle skips the
    working-size resample — feed it working-resolution stacks). Returns
    (flatfield, darkfield, baseline)."""
    x = np.asarray(images, np.float64)
    n, h, w = x.shape
    w_fit = (
        np.broadcast_to(
            np.asarray(fitting_weight, np.float64), x.shape
        ).copy()
        if fitting_weight is not None
        else np.ones_like(x)
    )

    if get_darkfield:
        S1, b1, _ = ladmap_fit_ref(
            x, w_fit, smoothness_flatfield, max_iterations, optimization_tol
        )
        D = estimate_darkfield_ref(x, S1, b1, smoothness_darkfield)
        x_work = x - D[None]
    else:
        D = np.zeros((h, w))
        x_work = x

    if sort_intensity:
        x_work = np.sort(x_work, axis=0)

    weight = w_fit.copy()
    last_S = None
    S = b = R = None
    for _ in range(max(1, int(max_reweight_iterations))):
        S, b, R = ladmap_fit_ref(
            x_work, weight, smoothness_flatfield, max_iterations,
            optimization_tol,
        )
        w_new = 1.0 / (np.abs(R) / (np.abs(x_work).mean() + 1e-6) + epsilon)
        weight = w_new * w_fit
        weight = weight * (weight.size / weight.sum())
        if last_S is not None:
            rel = np.linalg.norm((S - last_S).ravel()) / (
                np.linalg.norm(last_S.ravel()) + 1e-6
            )
            if rel < reweight_tol:
                last_S = S
                break
        last_S = S

    S = S / max(S.mean(), 1e-6)
    return S, D, b
