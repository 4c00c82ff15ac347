"""Loss-region timing on TPU: warp, photometric, assembly, full fwd, fwd+bwd."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state
from fsnet_tpu.utils.keys import decode_batch

B, H, W = 12, 192, 640


def timeit_chain(name, body, x0, n=6):
    body_j = jax.jit(body)
    x = jax.block_until_ready(body_j(x0))
    t0 = time.perf_counter()
    for _ in range(n):
        x = body_j(x)
    jax.block_until_ready(x)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:9.2f} ms", flush=True)


model = ge._flagship_model(H, W)
batch = jax.device_put(ge._synthetic_batch(B, H, W))
tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=100)
state = init_state(model, batch, tx, jax.random.PRNGKey(0))
head = model.bind({"params": state.params, "batch_stats": state.batch_stats},
                  rngs={"loss_noise": jax.random.PRNGKey(2)})

data = decode_batch(dict(batch))


def apply_sub(method_fn, *args, **kwargs):
    out, _ = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        *args, rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"], method=method_fn, **kwargs)
    return out


# 1. depth net fwd only (backbone + decoder through meta arch path)
def depth_fwd(carry):
    out = apply_sub(type(model).forward_test, data, {"is_training": False})
    return carry + 1e-12 * jnp.mean(out["depth"])
timeit_chain("forward_test (bb+dec)", depth_fwd, jnp.zeros(()))


# 2. full train fwd
def loss_fwd(carry):
    out = apply_sub(type(model).forward_train, data, {"is_training": True})
    return carry + 1e-12 * out["loss"]
timeit_chain("full train fwd", loss_fwd, jnp.zeros(()))


# 3. full train fwd+bwd
def loss_of(params):
    out, _ = model.apply(
        {"params": params, "batch_stats": state.batch_stats}, batch,
        {"is_training": True}, rngs={"loss_noise": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    return out["loss"]


def grad_body(params):
    g = jax.grad(loss_of)(params)
    return jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
timeit_chain("full train fwd+bwd", grad_body, state.params, n=4)
print("done", flush=True)
