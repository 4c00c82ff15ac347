"""Post-packed-decoder model timings (differencing harness, see
tpu_harness_calib.py): fwd and fwd+bwd of backbone / decoder / both."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

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
    print(f"{name:40s} {(t40 - t10) / 30 * 1e3:8.2f} ms/iter", flush=True)


def tsum(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) * 1e-12
               for x in jax.tree.leaves(tree) if hasattr(x, "dtype"))


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(DT)

    from fsnet_tpu.utils.builder import build
    from fsnet_tpu.models.heads.depth_decoder import MultiChannelDepthDecoder

    bk = build("fsnet_tpu.models.backbones.resnet.resnet", depth=18,
               num_stages=4, out_indices=(-1, 0, 1, 2, 3), norm_eval=False,
               dilations=(1, 1, 1, 1))
    bv = bk.init(jax.random.PRNGKey(0), img, train=True)
    bv = jax.tree.map(lambda x: x.astype(DT)
                      if x.dtype == jnp.float32 else x, bv)

    dec = MultiChannelDepthDecoder(num_output_channels=16, use_skips=True,
                                   scales=(0, 1, 2, 3), min_depth=0.5,
                                   max_depth=100.0)
    feats = [jnp.zeros((B, H // s, W // s, c), DT) for s, c in
             [(2, 64), (4, 64), (8, 128), (16, 256), (32, 512)]]
    dv = dec.init(jax.random.PRNGKey(0), feats, train=True)
    dv = jax.tree.map(lambda x: x.astype(DT)
                      if x.dtype == jnp.float32 else x, dv)

    def bk_fwd(c, v, x):
        out, _ = bk.apply(v, x + c.astype(DT) * 0, train=True,
                          mutable=["batch_stats"])
        return tsum(out)
    measure("resnet18 fwd", bk_fwd, bv, img)

    def dec_fwd(c, v, fs):
        out, _ = dec.apply(v, [f + c.astype(DT) * 0 for f in fs], train=True,
                           mutable=["batch_stats"])
        return tsum(out)
    measure("decoder fwd (packed auto)", dec_fwd, dv, feats)

    def bk_fb(c, v, x):
        def loss(v_):
            out, _ = bk.apply(v_, x + c.astype(DT) * 0, train=True,
                              mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(o.astype(jnp.float32))) * 1e-9
                       for o in out)
        l, g = jax.value_and_grad(loss)(v)
        return l + tsum(g)
    measure("resnet18 fwd+bwd", bk_fb, bv, img)

    def dec_fb(c, v, fs):
        def loss(v_):
            out, _ = dec.apply(v_, [f + c.astype(DT) * 0 for f in fs],
                               train=True, mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(out[("depth", s, s)].astype(
                jnp.float32))) * 1e-9 for s in range(4))
        l, g = jax.value_and_grad(loss)(v)
        return l + tsum(g)
    measure("decoder fwd+bwd (packed auto)", dec_fb, dv, feats)

    def net_fb(c, bvv, dvv, x):
        def loss(vars_):
            b_, d_ = vars_
            fs, _ = bk.apply(b_, x + c.astype(DT) * 0, train=True,
                             mutable=["batch_stats"])
            out, _ = dec.apply(d_, list(fs), train=True,
                               mutable=["batch_stats"])
            return sum(jnp.sum(jnp.square(out[("depth", s, s)].astype(
                jnp.float32))) * 1e-9 for s in range(4))
        l, g = jax.value_and_grad(loss)((bvv, dvv))
        return l + tsum(g)
    measure("net fwd+bwd", net_fb, bv, dv, img)


if __name__ == "__main__":
    main()
