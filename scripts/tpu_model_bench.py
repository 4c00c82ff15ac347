"""Per-piece model timings with in-jit repetition (tunnel-dispatch-proof).

Times each piece as a K-iteration ``lax.scan`` chained through a scalar so
XLA cannot elide or overlap iterations; reports per-iteration ms.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

import __graft_entry__ as ge

B, H, W = 12, 192, 640
K = 10
DT = jnp.bfloat16


def timed(name, f, *args):
    """f maps (carry_scalar, *args) -> new scalar; scanned K times."""

    def run(*a):
        def body(c, _):
            return f(c, *a), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return c

    g = jax.jit(run)
    float(g(*args))  # compile + execute once
    t0 = time.perf_counter()
    float(g(*args))
    ms = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:36s} {ms:8.2f} ms/iter")


def tsum(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) * 1e-12
               for x in jax.tree.leaves(tree) if hasattr(x, "dtype"))


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(DT)

    # 1. stem conv alone
    stem = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)))
    sp = stem.init(jax.random.PRNGKey(0), img)
    sp = jax.tree.map(lambda x: x.astype(DT), sp)
    timed("stem 7x7s2 3->64", lambda c, p, x: c + tsum(
        stem.apply(p, x + c.astype(DT) * 0)), sp, img)

    # conv 3x3 16->16 @ full res (decoder's finest)
    c16 = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))
    x16 = jnp.zeros((B, H, W, 16), DT)
    p16 = jax.tree.map(lambda x: x.astype(DT),
                       c16.init(jax.random.PRNGKey(0), x16))
    timed("conv3x3 16->16 @192x640", lambda c, p, x: c + tsum(
        c16.apply(p, x + c.astype(DT) * 0)), p16, x16)

    # conv 3x3 96->32 @ /2 (decoder i=1 second conv)
    c32 = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)))
    x96 = jnp.zeros((B, H // 2, W // 2, 96), DT)
    p32 = jax.tree.map(lambda x: x.astype(DT),
                       c32.init(jax.random.PRNGKey(0), x96))
    timed("conv3x3 96->32 @96x320", lambda c, p, x: c + tsum(
        c32.apply(p, x + c.astype(DT) * 0)), p32, x96)

    # 2. resnet18 backbone fwd
    from fsnet_tpu.utils.builder import build
    bk = build("fsnet_tpu.models.backbones.resnet.resnet", depth=18,
               num_stages=4, out_indices=(-1, 0, 1, 2, 3), norm_eval=False,
               dilations=(1, 1, 1, 1))
    bv = bk.init(jax.random.PRNGKey(0), img, train=True)
    bv = jax.tree.map(lambda x: x.astype(DT)
                      if x.dtype == jnp.float32 else x, bv)

    def bk_fwd(c, v, x):
        out, _ = bk.apply(v, x + c.astype(DT) * 0, train=True,
                          mutable=["batch_stats"])
        return c + tsum(out)
    timed("resnet18 fwd (5 scales)", bk_fwd, bv, img)

    # 3. decoder fwd on realistic feature shapes
    from fsnet_tpu.models.heads.depth_decoder import MultiChannelDepthDecoder
    feats = [jnp.zeros((B, H // s, W // s, c), DT) for s, c in
             [(2, 64), (4, 64), (8, 128), (16, 256), (32, 512)]]
    dec = MultiChannelDepthDecoder(num_output_channels=16, use_skips=True,
                                   scales=(0, 1, 2, 3), min_depth=0.5,
                                   max_depth=100.0)
    dv = dec.init(jax.random.PRNGKey(0), feats, train=True)
    dv = jax.tree.map(lambda x: x.astype(DT)
                      if x.dtype == jnp.float32 else x, dv)

    def dec_fwd(c, v, fs):
        out, _ = dec.apply(v, [f + c.astype(DT) * 0 for f in fs], train=True,
                           mutable=["batch_stats"])
        return c + tsum(out)
    timed("decoder fwd", dec_fwd, dv, feats)

    # 4. backbone+decoder fwd+bwd with a mean-depth loss
    def net_fwd_bwd(c, bvv, dvv, x):
        def loss_fn(vars_):
            bvv_, dvv_ = vars_
            fs, _ = bk.apply(bvv_, x + c.astype(DT) * 0, train=True,
                             mutable=["batch_stats"])
            out, _ = dec.apply(dvv_, list(fs), train=True,
                               mutable=["batch_stats"])
            return sum(jnp.mean(out[("depth", s, s)].astype(jnp.float32))
                       for s in range(4)) * 1e-3
        l, grads = jax.value_and_grad(loss_fn)((bvv, dvv))
        return c + l + tsum(grads)
    timed("net fwd+bwd (mean-depth loss)", net_fwd_bwd, bv, dv, img)


if __name__ == "__main__":
    main()
