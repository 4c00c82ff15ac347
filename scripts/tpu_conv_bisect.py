"""Bisect conv3x3_packed at the i1c1 shape: cols build vs matmul vs adds."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops import fast_conv as fc

DT = jnp.bfloat16


def measure(name, f, *args):
    def mk(K):
        def run(*a):
            def body(c, _):
                return c + f(c, *a) * 1e-12, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
            return c
        return jax.jit(run)

    g10, g40 = mk(10), mk(40)
    float(g10(*args)); float(g40(*args))
    t0 = time.perf_counter(); float(g10(*args)); t10 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(g40(*args)); t40 = time.perf_counter() - t0
    print(f"{name:46s} {(t40 - t10) / 30 * 1e3:8.2f} ms/iter", flush=True)


def ts(x):
    return jnp.sum(x.astype(jnp.float32))


def main():
    rng = np.random.RandomState(0)
    B, H, NB = 12, 96, 80
    C, Co, P = 96, 32, 4
    xp = jnp.asarray(rng.rand(B, H, NB, P * C).astype(np.float32)).astype(DT)
    w = jnp.asarray(rng.rand(3, 3, C, Co).astype(np.float32)).astype(DT)

    measure("full conv i1c1", lambda c, x: ts(fc.conv3x3_packed(
        x + c.astype(DT) * 0, w, None, C=C, pad_mode="replicate")), xp)
    measure("cols only", lambda c, x: ts(fc._part_cols(
        x + c.astype(DT) * 0, C, P, "replicate")), xp)

    K = 3 * (P + 2) * C
    cols2 = jnp.asarray(rng.rand(B * (H + 2) * NB, (P + 2) * C)
                        .astype(np.float32)).astype(DT)
    wcat = jnp.asarray(rng.rand((P + 2) * C, 3 * P * Co)
                       .astype(np.float32)).astype(DT)
    measure("bare matmul [94k,576]@[576,384]",
            lambda c, x: ts(jnp.dot(x + c.astype(DT) * 0, wcat,
                                    preferred_element_type=DT)), cols2)
    measure("bare matmul f32acc",
            lambda c, x: ts(jnp.dot(x + c.astype(DT) * 0, wcat,
                                    preferred_element_type=jnp.float32)),
            cols2)

    y = jnp.asarray(rng.rand(B, H + 2, NB, 3 * P * Co)
                    .astype(np.float32)).astype(DT)
    N = P * Co
    measure("shifted adds", lambda c, v: ts(
        (v + c.astype(DT) * 0)[:, 0:H, :, 0:N]
        + v[:, 1:H + 1, :, N:2 * N] + v[:, 2:H + 2, :, 2 * N:]), y)

    # wmat construction (traced .at[].set scatters)
    measure("toeplitz wmat build", lambda c, ww: ts(
        fc._toeplitz_wmat(ww + c.astype(DT) * 0, P)), w)


if __name__ == "__main__":
    main()
