"""Bisect the packed decoder: per-piece TPU timings (differencing harness)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops import fast_conv as fc

B, H, W = 12, 192, 640
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
    print(f"{name:44s} {(t40 - t10) / 30 * 1e3:8.2f} ms/iter", flush=True)


def ts(x):
    return jnp.sum(x.astype(jnp.float32))


def main():
    rng = np.random.RandomState(0)

    def mk_x(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32)).astype(DT)

    # packed conv stages (input packed at P_in, C_in -> Co)
    stages = [
        ("i2c0 128->64 @24x80", (B, 24, 80, 128), 128, 64, "zeros"),
        ("i2c1 128->64 @48x160", (B, 48, 80, 256), 128, 64, "replicate"),
        ("i1c0 64->32 @48x160", (B, 48, 80, 128), 64, 32, "zeros"),
        ("i1c1 96->32 @96x320", (B, 96, 80, 384), 96, 32, "replicate"),
        ("i0c0 32->16 @96x320", (B, 96, 80, 128), 32, 16, "zeros"),
        ("i0c1 16->16 @192x640", (B, 192, 80, 128), 16, 16, "replicate"),
        ("disp0 16->16 @192x640", (B, 192, 80, 128), 16, 16, "replicate"),
    ]
    for name, shape, C, Co, pm in stages:
        xp = mk_x(shape)
        w = mk_x((3, 3, C, Co))
        bias = mk_x((Co,))
        measure(f"conv {name}", lambda c, x, w=w, b=bias, C=C, pm=pm:
                ts(fc.conv3x3_packed(x + c.astype(DT) * 0, w, b, C=C,
                                     pad_mode=pm)), xp)

    # native coarse convs
    import flax.linen as nn
    for name, shape, Co in [("i4c0 512->256 @6x20", (B, 6, 20, 512), 256),
                            ("i4c1 512->256 @12x40", (B, 12, 40, 512), 256),
                            ("i3c0 256->128 @12x40", (B, 12, 40, 256), 128),
                            ("i3c1 256->128 @24x80", (B, 24, 80, 256), 128)]:
        x = mk_x(shape)
        conv = nn.Conv(Co, (3, 3), padding=((1, 1), (1, 1)))
        v = jax.tree.map(lambda a: a.astype(DT),
                         conv.init(jax.random.PRNGKey(0), x))
        measure(f"native {name}", lambda c, v, x, conv=conv:
                ts(conv.apply(v, x + c.astype(DT) * 0)), v, x)

    # BN moments + apply at the big shape
    xp = mk_x((B, 192, 80, 128))
    measure("bn moments+apply @192x640x16(pk)",
            lambda c, x: ts(fc.batchnorm_packed(
                x, 16, *fc.batch_moments_packed(x + c.astype(DT) * 0, 16),
                jnp.ones(16), jnp.zeros(16))), xp)

    # upsample + concat
    xp2 = mk_x((B, 96, 80, 128))
    measure("upsample2x_packed @96x320(pk32)",
            lambda c, x: ts(fc.upsample2x_packed(x + c.astype(DT) * 0, 32)),
            xp2)
    a = mk_x((B, 96, 80, 256))
    b = mk_x((B, 96, 80, 512))
    measure("concat_packed 32+64 @96x320",
            lambda c, x, y=b: ts(fc.concat_packed(
                x + c.astype(DT) * 0, 32, y, 64, 8)), a)

    # gather_activation at full res
    from fsnet_tpu.ops.depth_codec import build_depth_bins, gather_activation
    bins = jnp.asarray(build_depth_bins(0.5, 100.0, 16))
    lg = mk_x((B, 192, 640, 16))
    measure("gather_activation @192x640x16",
            lambda c, x: ts(gather_activation(x + c.astype(DT) * 0, bins)),
            lg)


if __name__ == "__main__":
    main()
