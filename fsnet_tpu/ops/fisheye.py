"""Mei unified camera model (fisheye) — forward projection + fixed-iteration
inverse, TPU-native.

Reference: ``monodepth/networks/utils/mei_fisheye_utils.py`` — forward model
``_cam2image:23-51`` (unit sphere -> mirror -> radial distortion -> focal),
inverse via numba Newton (radial) + bisection (mirror) per pixel with a
host-side cache (``:66-120,139-187``).

TPU-first design (SURVEY.md §7 hard-part 3):

* ``backtrack_ray_map``: vectorized numpy fixed-point solve over the whole
  pixel grid at once — runs once per (H, W, intrinsics) on the host at
  dataset-build time (the reference's per-pixel numba loop, vectorized).
* ``image2cam_jax``: the same solve as fixed-iteration vectorized jnp for
  in-graph use (static iteration counts; jit/grad-safe).
* ``cam2image``: pure-jnp forward model used inside the fisheye warp loss.

Calib dict layout matches the reference yaml:
``{"mirror_parameters": {"xi": ...}, "distortion_parameters": {"k1":..., "k2":...}}``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def mei_distort(x, y, k1, k2):
    """Radial distortion on the normalized plane (reference ``:16-24``)."""
    ro2 = x * x + y * y
    factor = 1.0 + k1 * ro2 + k2 * ro2 * ro2
    return x * factor, y * factor


def cam2image(points, P, xi, k1, k2, eps: float = 1e-6):
    """Camera points [..., 3] -> pixel (x, y, signed_norm) [..., 3]
    (reference ``_cam2image:23-51``). All jnp; P is [3, 4]-like or [4, 4]."""
    norm = jnp.linalg.norm(points, axis=-1)
    x = points[..., 0] / (norm + eps)
    y = points[..., 1] / (norm + eps)
    z = points[..., 2] / (norm + eps)

    x = x / (z + xi + eps)
    y = y / (z + xi + eps)
    x, y = mei_distort(x, y, k1, k2)

    gamma1, gamma2 = P[0, 0], P[1, 1]
    u0, v0 = P[0, 2], P[1, 2]
    px = gamma1 * x + u0
    py = gamma2 * y + v0
    signed_norm = norm * points[..., 2] / (jnp.abs(points[..., 2]) + eps)
    return jnp.stack([px, py, signed_norm], axis=-1)


# ------------------------------------------------------------ inverse (host)

def _newton_radial_np(r1: np.ndarray, k1: float, k2: float,
                      iters: int = 50, tol: float = 1e-6) -> np.ndarray:
    """Vectorized Newton solve of r1 = r0 (1 + k1 r0^2 + k2 r0^4) for r0
    (reference ``newton_methods:71-84``, per-pixel -> whole-grid)."""
    r0 = r1.copy()

    def f(x):
        return x - r1 / (1.0 + k1 * x ** 2 + k2 * x ** 4)

    for _ in range(iters):
        fx = f(r0)
        dfx = (f(r0 + tol) - fx) / tol
        step = np.where(np.abs(dfx) > 1e-12, fx / np.where(dfx == 0, 1, dfx), 0.0)
        converged = np.abs(fx) < tol
        r0 = np.where(converged, r0, r0 - step)
    return r0


def _bisection_mirror_np(r0: np.ndarray, xi: float, iters: int = 50,
                         tol: float = 1e-6) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized bisection solve of r0^2 = (1 - Z^2)/(xi + Z)^2 for Z in
    [0, 1] (reference ``bisection_methods:86-104``). Returns (valid, Z)."""

    def g(Z):
        return r0 ** 2 - (1.0 - Z ** 2) / (xi + Z) ** 2

    lo = np.zeros_like(r0)
    hi = np.ones_like(r0)
    y_lo = g(lo)
    y_hi = g(hi)
    valid = (y_lo * y_hi) <= 0

    for _ in range(iters):
        mid = (lo + hi) / 2.0
        y_mid = g(mid)
        go_right = y_mid * g(lo) < 0
        hi = np.where(go_right, mid, hi)
        lo = np.where(go_right, lo, mid)
    Z = (lo + hi) / 2.0
    return valid, np.where(valid, Z, lo - 1.0)


def backtrack_ray_map(H: int, W: int, P: np.ndarray, xi: float, k1: float,
                      k2: float, ref_compat_xy: bool = False):
    """Full-image inverse projection: pixel grid -> (X, Y, Z, mask), each
    [1, H, W] float32 — X/Y/Z are the per-pixel unit-"norm" ray components so
    that ``point3d = ray * norm_prediction``.

    Vectorizes reference ``MeiCameraProjection.image2cam`` cache-entry
    construction (``mei_fisheye_utils.py:153-173``) with ONE documented
    deviation: the reference solves the radial backtracking for ``r0`` (used
    for Z) but never rescales X/Y by ``r0/r1`` — its own docstring step 2
    ("backtrack the normalized plane coordinates: X = X * r0 / r1") is absent
    from the code, so its cached rays keep the *distorted*-plane X/Y and its
    ``cam2image(image2cam(norm))`` round trip is not the identity. We apply
    the rescale (our round-trip test demands it); ``ref_compat_xy=True``
    reproduces the reference's behavior bit-for-bit for the torch-oracle
    parity suite."""
    u0, v0 = float(P[0, 2]), float(P[1, 2])
    gamma1, gamma2 = float(P[0, 0]), float(P[1, 1])

    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    X = (uu - u0) / gamma1
    Y = (vv - v0) / gamma2

    r1 = np.sqrt(X ** 2 + Y ** 2)
    r0 = _newton_radial_np(r1, k1, k2)
    valid, Z = _bisection_mirror_np(r0, xi)

    mask = valid.astype(np.float32)
    mask[Z < 0.05] = 0
    not_mask = mask == 0
    Z = Z.copy()
    Z[not_mask] = -1.0
    if not ref_compat_xy:
        # undistorted normalized plane coords (see docstring deviation note)
        X = X * r0 / np.maximum(r1, 1e-12)
        Y = Y * r0 / np.maximum(r1, 1e-12)
    X[not_mask] = -1.0
    Y[not_mask] = -1.0
    X = X * (Z + xi)
    Y = Y * (Z + xi)
    return (X[None].astype(np.float32), Y[None].astype(np.float32),
            Z[None].astype(np.float32), mask[None].astype(np.float32))


class MeiCameraProjection:
    """Host-cached inverse ray maps + jnp forward model, API-compatible with
    the reference class (``mei_fisheye_utils.py:122-187``)."""

    def __init__(self):
        self.cache: Dict = {}

    @staticmethod
    def _calib_params(calib: Dict):
        return (float(calib["mirror_parameters"]["xi"]),
                float(calib["distortion_parameters"]["k1"]),
                float(calib["distortion_parameters"]["k2"]))

    def get_ray_map(self, H: int, W: int, P, calib: Dict):
        """(X, Y, Z, mask) numpy [1, H, W] for one camera; cached."""
        xi, k1, k2 = self._calib_params(calib)
        P = np.asarray(P)
        key = (H, W, float(P[0, 0]), float(P[1, 1]), float(P[0, 2]),
               float(P[1, 2]), k1, k2, xi)
        if key not in self.cache:
            self.cache[key] = backtrack_ray_map(H, W, P, xi, k1, k2)
        return self.cache[key]

    def image2cam(self, norm, P, calib_list):
        """norm [B, H, W, 1] (NHWC) + per-sample calib dicts ->
        (points [B, H, W, 3], mask [B, H, W]). Ray maps come from the host
        cache and enter the graph as constants."""
        B, H, W, _ = norm.shape
        Xs, Ys, Zs, Ms = [], [], [], []
        for b in range(B):
            X, Y, Z, M = self.get_ray_map(H, W, np.asarray(P[b]),
                                          calib_list[b])
            Xs.append(X); Ys.append(Y); Zs.append(Z); Ms.append(M)
        X = jnp.asarray(np.concatenate(Xs, axis=0))[..., None]  # [B, H, W, 1]
        Y = jnp.asarray(np.concatenate(Ys, axis=0))[..., None]
        Z = jnp.asarray(np.concatenate(Zs, axis=0))[..., None]
        mask = jnp.asarray(np.concatenate(Ms, axis=0))
        points = jnp.concatenate([X * norm, Y * norm, Z * norm], axis=-1)
        return points, mask

    def cam2image(self, points, P, calib: Dict):
        """jnp forward projection for one sample (see module-level
        :func:`cam2image`)."""
        xi, k1, k2 = self._calib_params(calib)
        return cam2image(points, jnp.asarray(P), xi, k1, k2)


def image2cam_fixed_iter(norm: jnp.ndarray, P: jnp.ndarray, xi, k1, k2,
                         newton_iters: int = 20, bisect_iters: int = 30):
    """Pure-jnp inverse (fixed iteration counts) — used when intrinsics are
    traced rather than static; differentiable and jit-safe."""
    B, H, W, _ = norm.shape
    u0, v0 = P[..., 0, 2], P[..., 1, 2]
    gamma1, gamma2 = P[..., 0, 0], P[..., 1, 1]

    uu, vv = jnp.meshgrid(jnp.arange(W, dtype=norm.dtype),
                          jnp.arange(H, dtype=norm.dtype), indexing="xy")
    X = (uu[None] - u0[:, None, None]) / gamma1[:, None, None]
    Y = (vv[None] - v0[:, None, None]) / gamma2[:, None, None]

    r1 = jnp.sqrt(X ** 2 + Y ** 2)
    r0 = r1
    for _ in range(newton_iters):  # Newton on the radial model
        f = r0 - r1 / (1.0 + k1 * r0 ** 2 + k2 * r0 ** 4)
        eps = 1e-6
        df = ((r0 + eps) - r1 / (1.0 + k1 * (r0 + eps) ** 2
                                 + k2 * (r0 + eps) ** 4) - f) / eps
        r0 = r0 - f / jnp.where(jnp.abs(df) > 1e-12, df, 1.0)

    def g(Z):
        return r0 ** 2 - (1.0 - Z ** 2) / (xi + Z) ** 2

    lo = jnp.zeros_like(r0)
    hi = jnp.ones_like(r0)
    valid = g(lo) * g(hi) <= 0
    for _ in range(bisect_iters):
        mid = (lo + hi) / 2.0
        go_right = g(mid) * g(lo) < 0
        hi = jnp.where(go_right, mid, hi)
        lo = jnp.where(go_right, lo, mid)
    Z = (lo + hi) / 2.0

    mask = (valid & (Z >= 0.05)).astype(norm.dtype)
    Z = jnp.where(mask > 0, Z, -1.0)
    Xn = jnp.where(mask > 0, X * r0 / jnp.maximum(r1, 1e-12) * (Z + xi), -1.0)
    Yn = jnp.where(mask > 0, Y * r0 / jnp.maximum(r1, 1e-12) * (Z + xi), -1.0)

    rays = jnp.stack([Xn, Yn, Z], axis=-1)[..., None, :]  # [B, H, W, 1, 3]
    points = rays[..., 0, :] * norm
    return points, mask
