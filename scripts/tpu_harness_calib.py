"""Calibrate the scan-repetition harness: per-iter = (t(K2)-t(K1))/(K2-K1).

Times elementwise ops at several sizes to establish the real achievable
HBM bandwidth and the harness' fixed overhead per iteration.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def scan_time(f, x, K):
    def run(a):
        def body(c, _):
            out = f(a + c.astype(a.dtype) * 0)
            return c + jnp.sum(out.astype(jnp.float32)) * 1e-12, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    g = jax.jit(run, static_argnums=())
    float(g(x))
    t0 = time.perf_counter()
    float(g(x))
    return time.perf_counter() - t0


def main():
    rng = np.random.RandomState(0)
    for shape in [(12, 192, 640, 16), (12, 192, 80, 128),
                  (12, 192, 640, 128), (12, 192, 640, 3)]:
        x = jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(
            jnp.bfloat16)
        mb = np.prod(shape) * 2 / 1e6
        t10 = scan_time(lambda a: a * 2 + 1, x, 10)
        t40 = scan_time(lambda a: a * 2 + 1, x, 40)
        per = (t40 - t10) / 30 * 1e3
        fixed = (t10 * 4 - t40) / 30 * 1e3
        bw = 2 * mb / per / 1e3  # read+write GB/s (excluding harness adds)
        print(f"{str(shape):24s} {mb:7.1f} MB  per-iter {per:6.2f} ms  "
              f"fixed/iter {fixed:6.2f} ms  ~{bw:5.0f} GB/s")


if __name__ == "__main__":
    main()
