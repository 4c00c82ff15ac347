"""Diff warp_prep_pallas operands against the XLA prep, field by field."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fsnet_tpu.ops.warp_depth import make_affine_rows
from fsnet_tpu.ops.geometry import reproject
from fsnet_tpu.ops.warp_fast import _indices_and_weights
from fsnet_tpu.ops.pallas import warp_kernel as wk
from fsnet_tpu.ops.pallas.prep_kernel import warp_prep_pallas

S, F, B, H, W, C = 2, 2, 2, 192, 640, 3
BAND = 4


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    depth = jnp.asarray((rng.rand(S * B, H, W) * 40 + 1).astype(np.float32))
    K = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    K[:, 0, 0], K[:, 1, 1] = 350.0, 350.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K)
    Ts = np.eye(4, dtype=np.float32)[None, None].repeat(F, 0).repeat(B, 1)
    Ts[..., 0, 3] = 0.1
    Ts[..., 2, 3] = -0.3
    K, inv_K, Ts = map(jnp.asarray, (K, inv_K, Ts))
    arows = make_affine_rows(K, inv_K, Ts, S)

    # XLA route
    def xla_prep(d):
        grids = jax.vmap(lambda ds: jax.vmap(
            lambda Tf: reproject(ds, K, inv_K, Tf))(Ts))(
                d.reshape(S, B, H, W, 1))
        g = grids.reshape(S * F * B, H, W, 2)
        iw = _indices_and_weights((S * F * B, H, W, C), g, "bilinear",
                                  "border", True, BAND)
        iword, ws = wk._make_ipack_packed(iw, W, wk._LANE, with_masks=False)
        fpack = jnp.stack([iw["fx"], iw["fy"]], axis=1)
        return iword, fpack, iw["ymin"] * C, ws

    iword_x, fpack_x, ymin_x, ws_x = jax.jit(xla_prep)(depth)

    def pl_prep(d, a):
        return warp_prep_pallas(d, a, S, F, BAND, C, packed=False)

    iword_p, fpack_p, ymin_p, ws_p = jax.jit(pl_prep)(depth, arows)

    iword_x, fpack_x, ymin_x, ws_x, iword_p, fpack_p, ymin_p, ws_p = map(
        np.asarray, (iword_x, fpack_x, ymin_x, ws_x, iword_p, fpack_p,
                     ymin_p, ws_p))

    print("ymin diff:", np.abs(ymin_p - ymin_x).max(),
          "ws diff:", np.abs(ws_p - ws_x).max())
    print("fpack diff:", np.abs(fpack_p - fpack_x).max())
    # mask out bit 28 (overlap bit: pallas-only extension)
    iw_pm = iword_p & ((1 << 28) - 1)
    for name, sh, m in [("x0r", 0, 127), ("x0t", 7, 3), ("d0", 9, 31),
                        ("x1r", 14, 127), ("x1t", 21, 3), ("d1", 23, 31)]:
        fa = (iw_pm >> sh) & m
        fb = (iword_x >> sh) & m
        bad = fa != fb
        print(f"{name}: mismatches {bad.mean():.4%}", end="")
        if bad.any():
            idx = np.argwhere(bad)[0]
            print(f"  first@{idx} pallas={fa[tuple(idx)]} "
                  f"xla={fb[tuple(idx)]}", end="")
        print(flush=True)


def oracle_check():
    """Recover pixel-space x from both preps and compare against a CPU f64
    oracle of the projection chain (the XLA einsum route is the suspected
    noise source: f32 matmuls run as bf16 passes on the MXU)."""
    print("== oracle check ==", flush=True)
    rng = np.random.RandomState(0)
    depth = jnp.asarray((rng.rand(S * B, H, W) * 40 + 1).astype(np.float32))
    K = np.eye(4, dtype=np.float32)[None].repeat(B, 0)
    K[:, 0, 0], K[:, 1, 1] = 350.0, 350.0
    K[:, 0, 2], K[:, 1, 2] = W / 2, H / 2
    inv_K = np.linalg.inv(K)
    Ts = np.eye(4, dtype=np.float32)[None, None].repeat(F, 0).repeat(B, 1)
    Ts[..., 0, 3] = 0.1
    Ts[..., 2, 3] = -0.3
    Kj, inv_Kj, Tsj = map(jnp.asarray, (K, inv_K, Ts))
    arows = make_affine_rows(Kj, inv_Kj, Tsj, S)

    # CPU f64 oracle from the same arows values
    ar = np.asarray(arows, np.float64)           # [N, 16]
    N = ar.shape[0]
    d_np = np.asarray(depth, np.float64)
    jj, ii = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    x_oracle = np.zeros((N, H, W))
    for n in range(N):
        A = ar[n, :9].reshape(3, 3)
        b = ar[n, 9:12]
        dd = d_np[n // (F * B) * B + n % B]
        cx = A[0, 0] * jj + A[0, 1] * ii + A[0, 2]
        cz = A[2, 0] * jj + A[2, 1] * ii + A[2, 2]
        x_oracle[n] = (dd * cx + b[0]) / (dd * cz + b[2] + 1e-7)
    x_oracle = np.clip(x_oracle, 0.0, W - 1)

    # XLA route x
    def xla_x(d):
        grids = jax.vmap(lambda ds: jax.vmap(
            lambda Tf: reproject(ds, Kj, inv_Kj, Tf))(Tsj))(
                d.reshape(S, B, H, W, 1))
        g = grids.reshape(S * F * B, H, W, 2)
        from fsnet_tpu.ops.warp import _unnormalize
        return jnp.clip(_unnormalize(g[..., 0], W, True), 0.0, W - 1)

    xx = np.asarray(jax.jit(xla_x)(depth), np.float64)

    # Pallas prep x: decode iword + fpack (x = (ws + x0t)*L + x0r + fx,
    # exact wherever the window didn't clip)
    def pl_prep(d, a):
        return warp_prep_pallas(d, a, S, F, BAND, C, packed=False)

    iword, fpack, _, ws = map(np.asarray, jax.jit(pl_prep)(depth, arows))
    L = wk._LANE
    T = W // L
    wsx = np.repeat(ws, L, axis=2)               # [N, H, W]
    xp = ((wsx + ((iword >> 7) & 3)) * L + (iword & 127)
          + np.asarray(fpack, np.float64)[:, 0])
    ok = (xp >= 1) & (xp <= W - 2)               # skip window/border clips
    exla = np.abs(xx - x_oracle)[ok]
    epal = np.abs(xp - x_oracle)[ok]
    print(f"|x_xla - oracle|: mean {exla.mean():.5f} p99 "
          f"{np.percentile(exla, 99):.5f} max {exla.max():.5f}")
    print(f"|x_pallas - oracle|: mean {epal.mean():.5f} p99 "
          f"{np.percentile(epal, 99):.5f} max {epal.max():.5f}")


if __name__ == "__main__":
    oracle_check()
