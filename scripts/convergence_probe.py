"""Multi-step convergence probe: band-warp vs exact-warp, bf16 vs f32.

Round-1 open questions (VERDICT "what's weak" #3/#4): the band-warp
approximation was only validated on *smooth* depth, but an untrained
network's depth is noise for the first epochs; and the bf16 headline rested
on single-step loss agreement. This probe trains the flagship recipe for N
steps from an IDENTICAL random init under
    (a) exact gather warp, f32   (oracle dynamics)
    (b) band-16 warp, f32        (isolates the band approximation)
    (c) band-16 warp, bf16       (the production configuration)
and reports per-step loss divergence plus depth AbsRel against analytic GT.

Data is synthetically *consistent*: each scene is two infinite textured
planes (ground + wall) with a procedural 3D texture psi(X); frame t's image
is psi evaluated at the plane intersection of each pixel ray, so the
photometric loss is genuinely minimizable through the same warp chain the
reference uses (no occlusion handling — min-reprojection/automask absorb
that, as on real data). GT depth is analytic, so AbsRel is exact.

Run on TPU:  python scripts/convergence_probe.py --steps 300 --batch 4
Results are appended to BASELINE.md by hand.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 192, 640
FRAMES = (0, 1, -1)


# ------------------------------------------------------------ synthetic scenes

def _texture(X, phases, freqs, texless=()):
    """Procedural 3-channel texture over 3D points X [..., 3] -> [..., 3].

    ``texless``: (center [3], radius) spheres around which the texture
    amplitude fades to zero — frame-consistent textureless regions (the
    band re-gate study's hard-scene requirement: automask/min-reprojection
    must cope with zero photometric signal there)."""
    amp = np.ones(X.shape[:-1], np.float32)
    for (c0, r0) in texless:
        dist = np.linalg.norm(X - c0, axis=-1)
        amp = amp * np.clip((dist - r0) / max(0.3 * r0, 1.0), 0.0, 1.0)
    out = []
    for c in range(3):
        v = 0.5 * np.ones(X.shape[:-1], np.float32)
        for (f, p, a) in zip(freqs[c], phases[c],
                             (0.25, 0.15, 0.08)):
            v = v + a * amp * np.sin(X @ f + p)
        out.append(v)
    return np.clip(np.stack(out, axis=-1), 0.0, 1.0).astype(np.float32)


def _plane_depth(n, d, rays):
    """Depth along each pixel ray for plane n.X = d; inf where behind."""
    denom = rays @ n
    depth = np.where(np.abs(denom) > 1e-6, d / np.maximum(denom, 1e-6), np.inf)
    return np.where(depth > 0.1, depth, np.inf).astype(np.float32)


def _box_depth(bmin, bmax, d, o):
    """z-depth s at which the ray ``o + s*d`` (d has z == 1, so s is
    camera-z depth) enters the axis-aligned box [bmin, bmax]; inf on miss."""
    d = np.where(np.abs(d) < 1e-9, np.where(d >= 0, 1e-9, -1e-9), d)
    t0 = (bmin - o) / d
    t1 = (bmax - o) / d
    tn = np.max(np.minimum(t0, t1), axis=-1)
    tf = np.min(np.maximum(t0, t1), axis=-1)
    hit = (tn <= tf) & (tf > 0) & (tn > 0.1)
    return np.where(hit, tn, np.inf).astype(np.float32)


def _scene_frame(K_inv, T0t_inv, planes, phases, freqs, boxes=(),
                 texless=()):
    """Render image + depth of the scene seen from camera t.

    ``T0t_inv`` maps camera-t coords back to frame-0 (world) coords; planes
    are given in frame-0 coords as (n, d) with n.X = d; ``boxes`` as
    (bmin [3], bmax [3]) AABBs in frame-0 coords (hard scenes: free-standing
    occluders with sharp depth edges and real occlusion changes under the
    probe's camera motion)."""
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32), indexing="xy")
    pix = np.stack([uu, vv, np.ones_like(uu)], axis=-1)    # [H, W, 3]
    rays = pix @ K_inv.T                                    # [H, W, 3]

    R_inv, t_inv = T0t_inv[:3, :3], T0t_inv[:3, 3]
    depth = np.full((H, W), np.inf, np.float32)
    for (n0, d0) in planes:
        # plane in camera-t coords: n0.(R_inv Xt + t_inv) = d0
        # -> (R_inv^T n0).Xt = d0 - n0.t_inv
        nt = n0 @ R_inv
        dt = d0 - n0 @ t_inv
        depth = np.minimum(depth, _plane_depth(nt.astype(np.float32),
                                               np.float32(dt), rays))
    dirs0 = rays @ R_inv.T                                  # frame-0 ray dirs
    for (bmin, bmax) in boxes:
        depth = np.minimum(depth, _box_depth(bmin, bmax, dirs0, t_inv))
    depth = np.clip(depth, 0.5, 80.0)
    Xt = rays * depth[..., None]                            # camera-t points
    X0 = Xt @ R_inv.T + t_inv                               # frame-0 coords
    return _texture(X0, phases, freqs, texless), depth


def make_batch(rng, batch, hard=False):
    """A consistent 3-frame batch in the framework's dict protocol.

    ``hard=True`` (band re-gate study, round-2 VERDICT item 2): adds 4-8
    free-standing box occluders on the ground plane (many sharp depth edges
    with real parallax + occlusion changes) and 1-2 textureless spheres of
    fading photometric signal — the failure modes two infinite planes can't
    exercise."""
    from scipy.spatial.transform import Rotation

    from fsnet_tpu.utils.keys import encode_batch

    K = np.array([[0.58 * W, 0, 0.5 * W], [0, 1.92 * H, 0.5 * H], [0, 0, 1]],
                 np.float32)
    K_inv = np.linalg.inv(K)

    images = {f: [] for f in FRAMES}
    depths0 = []
    poses = {1: [], -1: []}
    for _ in range(batch):
        ground_y = rng.uniform(1.4, 1.8)
        ground_tilt = rng.uniform(-0.03, 0.03)
        wall_z = rng.uniform(18.0, 35.0)
        planes = [
            (np.array([0.0, 1.0, ground_tilt], np.float32), ground_y),
            (np.array([0.0, 0.0, 1.0], np.float32), wall_z),
        ]
        boxes, texless = [], []
        if hard:
            for _ in range(rng.randint(4, 9)):
                cx = rng.uniform(-9.0, 9.0)
                cz = rng.uniform(5.0, min(wall_z - 2.0, 28.0))
                w2 = rng.uniform(0.3, 1.5)
                d2 = rng.uniform(0.3, 1.5)
                hgt = rng.uniform(0.6, 2.6)
                boxes.append((
                    np.array([cx - w2, ground_y - hgt, cz - d2], np.float32),
                    np.array([cx + w2, ground_y, cz + d2], np.float32)))
            for _ in range(rng.randint(1, 3)):
                c0 = np.array([rng.uniform(-8, 8), ground_y,
                               rng.uniform(6, 25)], np.float32)
                texless.append((c0, rng.uniform(2.0, 5.0)))
        freqs = [[rng.uniform(0.3, 3.0, 3).astype(np.float32)
                  for _ in range(3)] for _ in range(3)]
        phases = [rng.uniform(0, 6.28, 3).astype(np.float32) for _ in range(3)]

        T = {}
        for f in (1, -1):
            M = np.eye(4, dtype=np.float32)
            M[:3, :3] = Rotation.from_euler(
                "xyz", rng.uniform(-0.3, 0.3, 3), degrees=True).as_matrix()
            M[:3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.02, 0.02),
                        f * rng.uniform(0.55, 0.8)]
            T[f] = M
        T[0] = np.eye(4, dtype=np.float32)

        for f in FRAMES:
            img, dep = _scene_frame(K_inv, np.linalg.inv(T[f]), planes,
                                    phases, freqs, boxes, texless)
            images[f].append(img)
            if f == 0:
                depths0.append(dep)
        for f in (1, -1):
            poses[f].append(T[f])

    P2 = np.zeros((batch, 3, 4), np.float32)
    P2[:, :3, :3] = K
    data = {"P2": P2}
    for f in FRAMES:
        arr = np.stack(images[f])
        data[("image", f)] = arr
        data[("original_image", f)] = arr
    for f in (1, -1):
        data[("relative_pose", f)] = np.stack(poses[f])
    return encode_batch(data), np.stack(depths0)


# --------------------------------------------------------------------- driver

def flagship(warp_impl, warp_band=16):
    from fsnet_tpu.models import MonoDepthWPose

    return MonoDepthWPose(
        depth_backbone_cfg=dict(
            name="fsnet_tpu.models.backbones.resnet.resnet",
            depth=18, num_stages=4, out_indices=(-1, 0, 1, 2, 3),
            norm_eval=False, dilations=(1, 1, 1, 1)),
        head_cfg=dict(
            name="fsnet_tpu.models.heads.monodepth2_decoder.MonoDepth2Decoder",
            scales=(0, 1, 2, 3), height=H, width=W,
            min_depth=0.5, max_depth=100.0, is_log_image=False,
            overlapped_mask=True, warp_impl=warp_impl,
            warp_band=warp_band,
            depth_decoder_cfg=dict(
                name="fsnet_tpu.models.heads.depth_decoder."
                     "MultiChannelDepthDecoder",
                num_output_channels=16, use_skips=True, scales=(0, 1, 2, 3),
                min_depth=0.5, max_depth=100.0)),
        train_cfg=dict(frame_ids=list(FRAMES)),
        test_cfg=dict())


def abs_rel(pred, gt):
    ratio = np.median(gt) / max(np.median(pred), 1e-6)
    pred = np.clip(pred * ratio, 1e-3, 80.0)
    return float(np.mean(np.abs(pred - gt) / gt))


def run(tag, warp_impl, compute_dtype, batches, gts, steps, eval_every,
        warp_band=16, seed=0, sched=None, _cache={}):
    import jax
    import jax.numpy as jnp

    from fsnet_tpu.runtime.optim import build_optimizer
    from fsnet_tpu.runtime.state import init_state, make_eval_step, \
        make_train_step

    dtype = {None: None, "bf16": jnp.bfloat16}[compute_dtype]
    # reuse model instance + jitted steps across seeds of the same config:
    # the jit cache keys on the model (apply_fn) identity, so one compile
    # per config, not per seed
    ck = (warp_impl, warp_band, compute_dtype)
    if ck not in _cache:
        _cache[ck] = (flagship(warp_impl, warp_band),
                      make_train_step(donate=False, compute_dtype=dtype),
                      make_eval_step())
    model, train_step, eval_step = _cache[ck]
    # pin the batches on-device once: passing the host numpy batch into the
    # jitted step re-ships ~35 MB over the remote-TPU tunnel EVERY step
    # (~0.9 s/step measured — 30x the step itself)
    batches = [jax.device_put(b) for b in batches]
    # sched=(step_size_epochs, steps_per_epoch): position the StepLR decay
    # relative to the run length — the round-5 stress study emulates the
    # production recipe's schedule SHAPE (StepLR(8) of 20 epochs = decay at
    # 40% of training, /root/reference/configs/kitti360_wpose_example)
    # instead of the legacy (15, len(batches)) placement.
    step_size, spe = sched if sched else (15, len(batches))
    tx, _ = build_optimizer(dict(name="adam", lr=1e-4),
                            dict(name="StepLR", step_size=step_size),
                            steps_per_epoch=spe, clip_gradients=1.0)
    state = init_state(model, batches[0], tx, jax.random.PRNGKey(seed))
    rng = jax.random.PRNGKey(seed + 1)

    n_eval = min(4, len(batches))
    losses, absrels = [], {}
    t0 = time.time()
    for i in range(steps):
        state, metrics, _ = train_step(state, batches[i % len(batches)], rng)
        # keep the loss on-device: a float() here is a full host round trip
        # per step (~0.6 s over the remote-TPU tunnel — 25x the step itself)
        losses.append(metrics["loss"])
        if i % eval_every == 0 or i == steps - 1:
            vals = []
            for k in range(n_eval):
                pred = np.asarray(
                    eval_step(state, batches[k])["depth"])[..., 0]
                vals.append(abs_rel(pred, gts[k]))
            absrels[i] = float(np.mean(vals))
            print(f"[{tag}] step {i:4d} loss {float(losses[-1]):.4f} "
                  f"absrel {absrels[i]:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)
    losses = [float(l) for l in losses]
    return dict(tag=tag, seed=seed, losses=losses, absrels=absrels)


def study(args):
    """Variance-controlled band re-gate (round-2 VERDICT item 2): N seeds x
    {band configs + exact oracle} on hard scenes, >=1k steps; final AbsRel
    mean +- 95% CI per config; the shipped default must have a CI
    overlapping the exact warp's."""
    seeds = list(range(args.seed_start, args.seed_start + args.seeds))
    hard = not args.easy
    scene_sets = {}
    for s in seeds:
        rng = np.random.RandomState(1000 + s)
        print(f"generating {'hard' if hard else 'EASY'} scenes for seed "
              f"{s}...", flush=True)
        batches, gts = [], []
        for _ in range(args.n_batches):
            b, g = make_batch(rng, args.batch, hard=hard)
            batches.append(b)
            gts.append(g)
        scene_sets[s] = (batches, gts)

    results = []
    for cfg in args.configs:
        warp, prec = cfg.split(":")
        band = 16
        if warp.startswith("band") and warp != "band":
            band = int(warp[len("band"):])
            warp = "band"
        for s in seeds:
            batches, gts = scene_sets[s]
            print(f"== {cfg} seed {s}", flush=True)
            sched = None
            if args.prod_sched:
                # production-shaped StepLR: one decay at 40% of the run
                sched = (8, max(args.steps // 20, 1))
            results.append(run(f"{cfg}#s{s}", warp,
                               None if prec == "f32" else prec, batches,
                               gts, args.steps, args.eval_every,
                               warp_band=band, seed=s, sched=sched))
            with open(args.out, "w") as f:
                json.dump(results, f)

    print("\n== band re-gate study: final AbsRel mean +- 95% CI ==")
    for cfg in args.configs:
        finals = [r["absrels"][max(map(int, r["absrels"]))]
                  for r in results if r["tag"].startswith(cfg + "#")]
        m, sd = float(np.mean(finals)), float(np.std(finals, ddof=1))
        ci = 1.96 * sd / np.sqrt(len(finals))
        print(f"{cfg}: {m:.4f} +- {ci:.4f}  (n={len(finals)}, "
              f"seeds {[round(f, 4) for f in finals]})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n_batches", type=int, default=16)
    ap.add_argument("--eval_every", type=int, default=25)
    ap.add_argument("--out", default="/tmp/convergence_probe.json")
    ap.add_argument("--configs", nargs="+",
                    default=["band:f32", "band:bf16", "gather:f32"])
    ap.add_argument("--seeds", type=int, default=0,
                    help=">0 switches to the multi-seed hard-scene band "
                         "re-gate study")
    ap.add_argument("--easy", action="store_true",
                    help="study mode: plain two-plane scenes (no occluders/"
                         "textureless fades) — tests the 'bf16 smoothing = "
                         "occlusion robustness' hypothesis (round-4 VERDICT "
                         "item 6): if shipped still beats f32 here, that "
                         "explanation is wrong")
    ap.add_argument("--seed_start", type=int, default=0,
                    help="study mode: first seed index (extend an earlier "
                         "study without re-running its seeds)")
    ap.add_argument("--prod_sched", action="store_true",
                    help="study mode: production-shaped StepLR (decay at "
                         "40%% of the run, as StepLR(8)/20 epochs)")
    args = ap.parse_args()

    if args.seeds > 0:
        return study(args)

    rng = np.random.RandomState(0)
    print("generating scenes...", flush=True)
    batches, gts = [], []
    for _ in range(args.n_batches):
        b, g = make_batch(rng, args.batch)
        batches.append(b)
        gts.append(g)

    results = []
    for cfg in args.configs:
        warp, prec = cfg.split(":")
        band = 16
        if warp.startswith("band") and warp != "band":
            band = int(warp[len("band"):])   # e.g. band12:f32
            warp = "band"
        print(f"== {cfg}: compiling...", flush=True)
        results.append(run(cfg, warp, None if prec == "f32" else prec,
                           batches, gts, args.steps, args.eval_every,
                           warp_band=band))
        with open(args.out, "w") as f:
            json.dump(results, f)

    ref = next((r for r in results if r["tag"] == "gather:f32"), results[0])
    print(f"\n== summary vs {ref['tag']} ==")
    for r in results:
        if r is ref:
            continue
        dl = np.abs(np.asarray(r["losses"]) - np.asarray(ref["losses"]))
        rl = dl / np.maximum(np.asarray(ref["losses"]), 1e-6)
        print(f"{r['tag']}: max|dloss| {dl.max():.5f} "
              f"(rel {rl.max():.4f}), final-loss rel "
              f"{rl[-1]:.4f}")
    for r in results:
        last = sorted(r["absrels"])[-1]
        print(f"{r['tag']}: absrel first {r['absrels'][0]:.4f} "
              f"-> final {r['absrels'][last]:.4f}")


if __name__ == "__main__":
    main()
