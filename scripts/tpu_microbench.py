"""Component-level timing on TPU with python-level chaining.

Each iteration's input depends on the previous iteration's output, so the
async axon dispatch cannot overlap or elide work. (fori_loop-based chaining
compiles pathologically slowly through the remote-compile tunnel; plain
chained dispatches compile fast and measure the same thing.)
"""
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
N = 10


def timeit_chain(name, body, x0, n=N):
    """body: x -> x (same pytree structure); chained across calls."""
    body_j = jax.jit(body)
    x = jax.block_until_ready(body_j(x0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        x = body_j(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:44s} {dt:10.2f} ms/iter", flush=True)
    return dt


rng = np.random.RandomState(0)
img = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
big_img = jnp.asarray(rng.rand(S * F * B, H, W, 3).astype(np.float32))
grid0 = jnp.asarray((rng.rand(S * F * B, H, W, 2) * 2 - 1).astype(np.float32))

# 1. backbone fwd
bb = resnet(18, out_indices=(-1, 0, 1, 2, 3), norm_eval=True)
bb_vars = bb.init(jax.random.PRNGKey(0), img, train=False)

def bb_body(x):
    feats = bb.apply(bb_vars, x, train=False)
    return x + 1e-12 * jnp.mean(feats[-1])
timeit_chain("resnet18 fwd", bb_body, img)

# 2. backbone + decoder fwd
feats0 = bb.apply(bb_vars, img, train=False)
dec = MultiChannelDepthDecoder(scales=(0, 1, 2, 3), num_output_channels=16,
                               min_depth=0.5, max_depth=100.0)
dec_vars = dec.init(jax.random.PRNGKey(1), feats0, train=False)

def dec_body(x):
    feats = bb.apply(bb_vars, x, train=False)
    outs = dec.apply(dec_vars, feats, train=False)
    return x + 1e-12 * jnp.mean(outs[("depth", 0, 0)])
timeit_chain("resnet18+decoder fwd", dec_body, img)

# 3. grid_sample fwd (96 warps of 192x640x3)
def gs_body(g):
    out = grid_sample(big_img, g)
    return g + 1e-12 * jnp.mean(out)
timeit_chain("grid_sample x96 fwd", gs_body, grid0)

# 4. grid_sample fwd+bwd wrt grid
def gs_grad_body(g):
    gr = jax.grad(lambda gg: jnp.sum(grid_sample(big_img, gg)))(g)
    return g + 1e-12 * gr
timeit_chain("grid_sample x96 grad(grid)", gs_grad_body, grid0)

# 5. ssim fwd
def ssim_body(x):
    s = ssim(x, jnp.roll(x, 1, axis=0))
    return x + 1e-12 * jnp.mean(s)
timeit_chain("ssim x96 fwd", ssim_body, big_img)

# 6. ssim grad
def ssim_grad_body(x):
    g = jax.grad(lambda a: jnp.sum(ssim(a, big_img)))(x)
    return x + 1e-12 * g
timeit_chain("ssim x96 grad", ssim_grad_body, big_img)

# 7. full model
model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))


def loss_of(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats}, batch,
        {"is_training": True}, rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    return out["loss"]


def loss_body(params):
    l = loss_of(params)
    return jax.tree.map(lambda p: p + 1e-12 * l, params)
timeit_chain("full loss fwd", loss_body, state.params, n=5)


def grad_body(params):
    g = jax.grad(loss_of)(params)
    return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
timeit_chain("full loss fwd+bwd", grad_body, state.params, n=5)

print("done", flush=True)
