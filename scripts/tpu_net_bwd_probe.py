"""Net fwd vs fwd+bwd attribution with the calibrated differencing harness
(per-iter = (t(K=40) - t(K=10)) / 30, tpu_harness_calib.py): quantifies the
round-1 "decoder bwd" lever before optimizing it. Grad uses sum(f**2) so the
forward cannot be DCE'd (linear-sum grads drop the fwd).
"""
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
    print(f"{name:44s} {(t40 - t10) / 30 * 1e3:8.2f} ms/iter", flush=True)


def tsum(tree):
    return sum(jnp.sum(x.astype(jnp.float32) ** 2) * 1e-12
               for x in jax.tree.leaves(tree) if hasattr(x, "dtype"))


def main():
    rng = np.random.RandomState(0)
    import fsnet_tpu.models.heads.depth_decoder as dd
    from fsnet_tpu.models.backbones.resnet import resnet

    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)).astype(DT)

    enc = resnet(depth=18, num_stages=4, out_indices=(-1, 0, 1, 2, 3),
                 norm_eval=False, dilations=(1, 1, 1, 1))
    ev = jax.jit(lambda k, xx: enc.init(k, xx, train=True))(
        jax.random.PRNGKey(0), x)
    ev = jax.tree.map(lambda a: a.astype(DT)
                      if a.dtype == jnp.float32 else a, ev)

    def enc_fwd(c, v, xx):
        fs = enc.apply(v, xx + c.astype(DT), train=True,
                       mutable=["batch_stats"])[0]
        return tsum(fs)

    def enc_fb(c, v, xx):
        g = jax.grad(lambda p: enc_fwd(c, {**v, "params": p}, xx))(
            v["params"])
        return tsum(g)

    measure("resnet18 fwd", enc_fwd, ev, x)
    measure("resnet18 fwd+bwd(params)", enc_fb, ev, x)

    feats = enc.apply(ev, x, train=True, mutable=["batch_stats"])[0]

    # unpacked bwd compiles take many minutes under scan(grad); opt-in
    variants = ((True, False) if os.environ.get("FSNET_PROBE_UNPACKED")
                else (True,))
    for packed in variants:
        dec = dd.MultiChannelDepthDecoder(
            packed=packed, num_output_channels=16, use_skips=True,
            scales=(0, 1, 2, 3), min_depth=0.5, max_depth=100.0)
        dv = jax.jit(lambda k, fs: dec.init(k, fs, train=True))(
            jax.random.PRNGKey(1), feats)
        dv = jax.tree.map(lambda a: a.astype(DT)
                          if a.dtype == jnp.float32 else a, dv)

        def dec_fwd(c, v, fs):
            out = dec.apply(v, [f + c.astype(DT) for f in fs], train=True,
                            mutable=["batch_stats"])[0]
            return tsum(out)

        def dec_fb(c, v, fs):
            g = jax.grad(lambda p: dec_fwd(c, {**v, "params": p}, fs))(
                v["params"])
            return tsum(g)

        def dec_fb_full(c, v, fs):
            # params AND input-features cotangents (the train step needs both)
            g = jax.grad(
                lambda p, f: dec_fwd(c, {**v, "params": p}, f),
                argnums=(0, 1))(v["params"], fs)
            return tsum(g)

        tag = "packed" if packed else "unpacked"
        measure(f"decoder[{tag}] fwd", dec_fwd, dv, feats)
        measure(f"decoder[{tag}] fwd+bwd(params)", dec_fb, dv, feats)
        measure(f"decoder[{tag}] fwd+bwd(params+feats)", dec_fb_full, dv,
                feats)


if __name__ == "__main__":
    main()
