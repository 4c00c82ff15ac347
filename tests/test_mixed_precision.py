"""Mixed-precision train step: bf16 compute, f32 master weights, loss close to
the f32 step."""
import numpy as np

import jax
import jax.numpy as jnp

from fsnet_tpu.runtime.optim import build_optimizer
from fsnet_tpu.runtime.state import init_state, make_train_step

from test_models import _flagship_cfg, _synthetic_batch


def test_bf16_step_matches_f32_loss():
    from fsnet_tpu.models import MonoDepthWPose
    model = MonoDepthWPose(**_flagship_cfg())
    batch = _synthetic_batch(np.random.RandomState(0), batch=2)
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None, steps_per_epoch=1)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))

    f32_step = make_train_step(donate=False)
    bf16_step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)

    _, m32, _ = f32_step(state, batch, jax.random.PRNGKey(1))
    s16, m16, _ = bf16_step(state, batch, jax.random.PRNGKey(1))

    l32, l16 = float(m32["loss"]), float(m16["loss"])
    assert np.isfinite(l16)
    assert abs(l32 - l16) / abs(l32) < 0.02  # bf16 rounding only

    # master params and batch_stats stay f32
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(s16.params))
    assert all(p.dtype == jnp.float32
               for p in jax.tree.leaves(s16.batch_stats))


def test_gather_activation_promotes_to_f32():
    """Decoded depth must stay f32 even for bf16 logits: it feeds camera
    geometry, where bf16's ~2px ULP at image-width scale quantizes the warp
    grids and freezes training (regression: bins were cast to bf16 once)."""
    import numpy as np
    import jax.numpy as jnp
    from fsnet_tpu.ops.depth_codec import build_depth_bins, gather_activation

    logits = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 16),
                         jnp.bfloat16)
    bins = jnp.asarray(build_depth_bins(0.5, 100.0, 16))
    depth = gather_activation(logits, bins)
    assert depth.dtype == jnp.float32
