"""bf16 warp/ssim/full-loss component timing on TPU."""
import time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
import __graft_entry__ as ge
from fsnet_tpu.ops.warp_fast import grid_sample_band
from fsnet_tpu.ops import ssim
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

N, H, W, C = 96, 192, 640, 3
BAND = 16
rng = np.random.RandomState(0)
img16 = jnp.asarray(rng.rand(N, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
u = np.tile(np.linspace(-1, 1, W)[None, None, :], (N, H, 1))
v = np.tile(np.linspace(-1, 1, H)[None, :, None], (N, 1, W))
dx = 30 * np.sin(v * 3) * 2 / (W - 1); dy = 3 * np.cos(u * 4) * 2 / (H - 1)
grid16 = jnp.asarray(np.stack([u + dx, v + dy], -1).astype(np.float32)).astype(jnp.bfloat16)

def timeit_chain(name, body, x0, n=8):
    body_j = jax.jit(body)
    x = jax.block_until_ready(body_j(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = body_j(x)
    jax.block_until_ready(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)

def warp_fwd(g):
    out = grid_sample_band(img16, g, band=BAND)
    return g + (1e-12 * jnp.mean(out)).astype(g.dtype)
timeit_chain("band warp fwd bf16", warp_fwd, grid16)

def warp_grad(g):
    gr = jax.grad(lambda gg: jnp.sum(
        grid_sample_band(img16, gg, band=BAND).astype(jnp.float32)))(g)
    return g + 1e-12 * gr
timeit_chain("band warp fwd+bwd bf16", warp_grad, grid16)

def ssim_body(x):
    s = ssim(x, jnp.roll(x, 1, axis=0))
    return x + (1e-12 * jnp.mean(s)).astype(x.dtype)
timeit_chain("ssim fwd bf16 (sep conv)", ssim_body, img16)

def ssim_grad_body(x):
    g = jax.grad(lambda a: jnp.sum(ssim(a, img16).astype(jnp.float32)))(x)
    return x + 1e-12 * g
timeit_chain("ssim grad bf16 (sep conv)", ssim_grad_body, img16)

# full bf16 train step components
model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(12, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))

def cast16(t):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, t)
p16, b16, s16 = cast16(state.params), cast16(batch), cast16(state.batch_stats)

def loss16(params):
    out, _ = model.apply({"params": params, "batch_stats": s16}, b16,
                         {"is_training": True},
                         rngs={"loss_noise": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    return out["loss"].astype(jnp.float32)

def fwd16(carry):
    return carry + 1e-12 * loss16(p16)
timeit_chain("full loss fwd bf16", fwd16, jnp.zeros(()), n=5)

def gradbody(params):
    g = jax.grad(loss16)(params)
    return jax.tree.map(lambda p, gg: p - jnp.asarray(1e-9, p.dtype) * gg, params, g)
timeit_chain("full loss fwd+bwd bf16", gradbody, p16, n=5)
print("done", flush=True)
