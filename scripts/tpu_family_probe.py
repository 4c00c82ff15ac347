"""Hardware validation of the non-flagship families on TPU: fisheye
(Mei-projection warps) and DCN (modulated deformable conv fwd+bwd).

Shapes are production-ish: fisheye at 192x384 (W%128==0 -> Pallas path),
DCN at a DLA-style feature map."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from fsnet_tpu.ops.fisheye import MeiCameraProjection
from fsnet_tpu.utils.keys import encode_batch

XI, K1, K2 = 2.2, 0.3, -0.05


def _calib():
    return {
        "mirror_parameters": {"xi": XI},
        "distortion_parameters": {"k1": K1, "k2": K2},
    }


def fisheye_step():
    B, H, W = 4, 192, 384
    P_np = np.zeros((3, 4), np.float32)
    P_np[0, 0] = P_np[1, 1] = 1.3 * W
    P_np[0, 2], P_np[1, 2], P_np[2, 2] = W / 2.0, H / 2.0, 1.0
    rng = np.random.RandomState(0)
    P = np.tile(P_np[None], (B, 1, 1))
    pose = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    pose[:, 0, 3] = 0.1
    mei = MeiCameraProjection()
    X, Y, Z, mask = mei.get_ray_map(H, W, P_np, _calib())
    rays = np.stack([X[0], Y[0], Z[0], mask[0]], axis=-1)
    img = lambda: rng.rand(B, H, W, 3).astype(np.float32)  # noqa: E731
    data = {
        ("image", 0): img(), ("image", 1): img(), ("image", -1): img(),
        ("original_image", 0): img(), ("original_image", 1): img(),
        ("original_image", -1): img(),
        ("relative_pose", 1): pose, ("relative_pose", -1): pose.copy(),
        "P2": P.astype(np.float32),
        "fisheye_rays": np.tile(rays[None], (B, 1, 1, 1)).astype(np.float32),
        "fisheye_params": np.tile(np.array([[XI, K1, K2]], np.float32),
                                  (B, 1)),
    }
    batch = jax.device_put(encode_batch(data))

    from fsnet_tpu.models import MonoDepthWPose
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_train_step
    model = MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet", depth=18,
            out_indices=(-1, 0, 1, 2, 3), norm_eval=False),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.fisheye_decoder.FishEyeDecoder",
            scales=(0, 1, 2, 3), height=H, width=W, min_depth=0.1,
            max_depth=30.0, is_log_image=False, overlapped_mask=True,
            depth_decoder_cfg=dict(
                name=("fsnet_tpu.models.heads.depth_decoder."
                      "MultiChannelDepthDecoder"),
                num_output_channels=16, scales=(0, 1, 2, 3),
                min_depth=0.1, max_depth=30.0)),
        train_cfg=dict(frame_ids=(0, 1, -1)),
        test_cfg=dict(),
    )
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4), None,
                            steps_per_epoch=10)
    state = init_state(model, batch, tx, jax.random.PRNGKey(0))
    step = make_train_step(donate=False, compute_dtype=jnp.bfloat16)
    rng_ = jax.random.PRNGKey(1)
    losses = []
    t0 = None
    for i in range(4):
        state, metrics, _ = step(state, batch, rng_)
        losses.append(float(metrics["loss"]))
        if i == 0:
            t0 = time.perf_counter()
    dt = (time.perf_counter() - t0) / 3 * 1000
    print(f"fisheye train step bf16 @{H}x{W}: {dt:.1f} ms/step, "
          f"losses {['%.5f' % v for v in losses]}", flush=True)
    assert all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0], "fisheye loss did not decrease"


def dcn_step():
    from fsnet_tpu.ops.dcn import modulated_deform_conv
    B, H, W, C = 8, 96, 128, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
    offset = jnp.asarray((rng.rand(B, H, W, 18) * 2 - 1).astype(np.float32))
    mask = jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32))
    w = jnp.asarray((rng.rand(3, 3, C, C) * 0.05).astype(np.float32))

    def loss(x, offset, w):
        out = modulated_deform_conv(x, offset, mask, w)
        return jnp.sum(out * out)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    t = g(x, offset, w)
    jax.block_until_ready(t)
    vals = [float(jnp.abs(v).sum()) for v in t]
    t0 = time.perf_counter()
    for _ in range(3):
        t = g(x, offset, w)
    _ = [float(jnp.abs(v).sum()) for v in t]
    dt = (time.perf_counter() - t0) / 3 * 1000
    print(f"DCN fwd+bwd @{B}x{H}x{W}x{C}: {dt:.1f} ms, grad norms "
          f"{['%.2f' % v for v in vals]}", flush=True)
    assert all(np.isfinite(v) and v > 0 for v in vals)


if __name__ == "__main__":
    fisheye_step()
    dcn_step()
    print("family probe OK", flush=True)
