"""Decoder sub-piece timings with the calibrated differencing harness
(per-iter = (t(K=40) - t(K=10)) / 30; cancels the ~3 ms/iter fixed cost the
axon platform charges every scan step — see tpu_harness_calib.py).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

B, H, W = 12, 192, 640
DT = jnp.bfloat16


def measure(name, f, *args):
    def mk(K):
        def run(*a):
            def body(c, _):
                out = f(c, *a)
                return c + out * 1e-12, None
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
    feats = [jnp.asarray(rng.rand(B, H // s, W // s, c).astype(np.float32)
                         ).astype(DT) for s, c in
             [(2, 64), (4, 64), (8, 128), (16, 256), (32, 512)]]

    from fsnet_tpu.models.heads.depth_decoder import (
        MultiChannelDepthDecoder, _DecoderTrunk)
    from fsnet_tpu.models import blocks

    def init_cast(mod, *a, **k):
        v = mod.init(jax.random.PRNGKey(0), *a, **k)
        return jax.tree.map(
            lambda x: x.astype(DT) if x.dtype == jnp.float32 else x, v)

    # full decoder
    dec = MultiChannelDepthDecoder(num_output_channels=16, use_skips=True,
                                   scales=(0, 1, 2, 3), min_depth=0.5,
                                   max_depth=100.0)
    dv = init_cast(dec, feats, train=True)

    def dec_fwd(c, v, fs):
        out, _ = dec.apply(v, [f + c.astype(DT) * 0 for f in fs], train=True,
                           mutable=["batch_stats"])
        return tsum(out)
    measure("full decoder fwd", dec_fwd, dv, feats)

    # trunk only
    trunk = _DecoderTrunk((0, 1, 2, 3), True, None)
    tv = init_cast(trunk, feats, train=True)

    def trunk_fwd(c, v, fs):
        out, _ = trunk.apply(v, [f + c.astype(DT) * 0 for f in fs],
                             train=True, mutable=["batch_stats"])
        return tsum(out)
    measure("trunk fwd", trunk_fwd, tv, feats)

    # one ConvBnReLU 16ch @full res, replicate pad
    cb = blocks.ConvBnReLU(output_features=16, kernel_size=(3, 3),
                           padding_mode="replicate")
    x16 = jnp.zeros((B, H, W, 16), DT)
    cbv = init_cast(cb, x16, True)

    def cb_fwd(c, v, x):
        out, _ = cb.apply(v, x + c.astype(DT) * 0, True,
                          mutable=["batch_stats"])
        return tsum(out)
    measure("ConvBnReLU 16->16 @192x640 (repl pad)", cb_fwd, cbv, x16)

    cbz = blocks.ConvBnReLU(output_features=16, kernel_size=(3, 3))
    cbzv = init_cast(cbz, x16, True)

    def cbz_fwd(c, v, x):
        out, _ = cbz.apply(v, x + c.astype(DT) * 0, True,
                           mutable=["batch_stats"])
        return tsum(out)
    measure("ConvBnReLU 16->16 @192x640 (zero pad)", cbz_fwd, cbzv, x16)

    # bare conv for reference
    cnv = nn.Conv(16, (3, 3), padding=((1, 1), (1, 1)))
    cnvv = init_cast(cnv, x16)
    measure("bare conv 16->16 @192x640",
            lambda c, v, x: tsum(cnv.apply(v, x + c.astype(DT) * 0)),
            cnvv, x16)

    # BN alone @ full res 16ch
    bn = blocks.BatchNorm()
    bnv = bn.init(jax.random.PRNGKey(0), x16, train=True)

    def bn_fwd(c, v, x):
        out, _ = bn.apply(v, x + c.astype(DT) * 0, train=True,
                          mutable=["batch_stats"])
        return tsum(out)
    measure("BatchNorm 16ch @192x640", bn_fwd, bnv, x16)

    # upsample
    x32h = jnp.zeros((B, H // 2, W // 2, 16), DT)
    measure("upsample2x @96x320x16",
            lambda c, x: tsum(blocks.upsample2x_nearest(x + c.astype(DT) * 0)),
            x32h)

    # gather_activation (bin softmax) @ full res
    from fsnet_tpu.ops.depth_codec import build_depth_bins, gather_activation
    bins = jnp.asarray(build_depth_bins(0.5, 100.0, 16))
    logits = jnp.zeros((B, H, W, 16), DT)
    measure("gather_activation @192x640x16",
            lambda c, x: tsum(gather_activation(x + c.astype(DT) * 0, bins)),
            logits)

    # pad2d edge @ full res
    measure("pad2d edge @192x640x16",
            lambda c, x: tsum(blocks.pad2d(x + c.astype(DT) * 0, 1, "edge")),
            x16)


if __name__ == "__main__":
    main()
