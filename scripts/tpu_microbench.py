"""Component-level timing on TPU: find where the 1.4s train step goes."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fsnet_tpu.models import resnet, MultiChannelDepthDecoder
from fsnet_tpu.ops import grid_sample, ssim
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state

B, H, W = 12, 192, 640
S, F = 4, 2

def timeit(name, fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = jax.block_until_ready(fn_j(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:10.2f} ms")
    return dt

rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
big_img = jnp.asarray(rng.rand(S * F * B, H, W, 3).astype(np.float32))
grid = jnp.asarray((rng.rand(S * F * B, H, W, 2) * 2 - 1).astype(np.float32))

# 1. backbone
bb = resnet(18, out_indices=(-1, 0, 1, 2, 3), norm_eval=False)
bb_vars = bb.init(jax.random.PRNGKey(0), img, train=False)
timeit("resnet18 fwd (eval)", lambda v, x: bb.apply(v, x, train=False), bb_vars, img)

# 2. backbone + decoder
dec = MultiChannelDepthDecoder(scales=(0, 1, 2, 3), num_output_channels=16,
                               min_depth=0.5, max_depth=100.0)
feats = bb.apply(bb_vars, img, train=False)
dec_vars = dec.init(jax.random.PRNGKey(1), feats)
timeit("decoder fwd", lambda v, f: dec.apply(v, f), dec_vars, feats)

# 3. grid sample fwd
timeit("grid_sample [96,192,640,3] fwd",
       lambda i, g: grid_sample(i, g), big_img, grid)

# 4. grid sample grad wrt grid
def gs_loss(g, i):
    return jnp.sum(grid_sample(i, g))
timeit("grid_sample grad-wrt-grid", jax.grad(gs_loss), grid, big_img)

# 5. ssim fwd
timeit("ssim [96,...] fwd", lambda a, b: jnp.sum(ssim(a, b)), big_img,
       jnp.roll(big_img, 1, axis=0))

# 6. ssim fwd+bwd
timeit("ssim grad", jax.grad(lambda a, b: jnp.sum(ssim(a, b))), big_img,
       jnp.roll(big_img, 1, axis=0))

# 7. full model pieces
model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))

def loss_only(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats}, batch,
        {"is_training": True}, rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    return out["loss"]

timeit("full fwd loss only", loss_only, state.params)
timeit("full value_and_grad", lambda p: jax.value_and_grad(loss_only)(p)[0],
       state.params)

def test_fwd(params):
    return model.apply(
        {"params": params, "batch_stats": state.batch_stats}, batch,
        {"is_training": False})["depth"]
timeit("forward_test (bb+dec)", test_fwd, state.params)
print("done")
