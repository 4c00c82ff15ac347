"""Inference demo (the reference's ``demos/demo.ipynb`` as a script): load a
config + checkpoint, run single-image depth inference, save a colorized
depth visualization.

Usage:
    python demos/demo.py --config configs/kitti360_wpose_example.py \
        --checkpoint CKPT --image IMG.png --output depth_vis.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(config, checkpoint, image_path, output):
    import cv2
    import jax
    import numpy as np

    from fsnet_tpu.runtime.checkpoint import load_models
    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_eval_step
    from fsnet_tpu.utils import build, cfg_from_file
    from fsnet_tpu.utils.keys import encode_batch

    cfg = cfg_from_file(config)
    meta_arch = build(**cfg.meta_arch)
    h, w, _ = cfg.data.rgb_shape

    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    orig_h, orig_w = img.shape[:2]
    resized = cv2.resize(img, (w, h)).astype(np.float32) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    normed = (resized - mean) / std

    P2 = np.zeros((1, 3, 4), np.float32)
    P2[:, 0, 0] = P2[:, 1, 1] = 0.58 * w
    P2[:, 0, 2], P2[:, 1, 2], P2[:, 2, 2] = w / 2, h / 2, 1.0
    batch = encode_batch({("image", 0): normed[None], "P2": P2})

    tx, _ = build_optimizer(dict(cfg.optimizer), None, steps_per_epoch=1)
    state = init_state(meta_arch, batch, tx, jax.random.PRNGKey(0),
                       is_training=False)
    if checkpoint:
        state, _ = load_models(checkpoint, state, strict=False)

    pred = make_eval_step()(state, batch)
    depth = np.asarray(pred["depth"])[0, ..., 0]
    disp = 1.0 / np.maximum(depth, 1e-3)
    disp = (disp - disp.min()) / (disp.max() - disp.min() + 1e-8)
    vis = cv2.applyColorMap((disp * 255).astype(np.uint8), cv2.COLORMAP_MAGMA)
    vis = cv2.resize(vis, (orig_w, orig_h))
    cv2.imwrite(output, vis)
    print(f"depth range [{depth.min():.2f}, {depth.max():.2f}] m -> {output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--image", required=True, dest="image_path")
    parser.add_argument("--output", default="depth_vis.png")
    args = parser.parse_args()
    main(args.config, args.checkpoint, args.image_path, args.output)
