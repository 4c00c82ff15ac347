"""Regenerate the ``meta_data/`` split files from dataset roots.

Ports the reference's split-generation notebooks to reproducible CLI
subcommands (``/root/reference/meta_data/kitti360_trainsub/read_kitti360.ipynb``,
``nusc_trainsub/read_nuscnes.ipynb``, ``nusc_trainsub/json_from_cfg.ipynb``),
so the repo can rebuild every meta_data artifact without an existing FSNet
checkout:

- ``kitti360``   : seeded 80/20 sequence split over ``data_poses`` keyframes ->
                   ``kitti360_train.txt`` / ``kitti360_val.txt``
                   (lines ``sequence,i,key,prev,next``)
- ``fisheye-mask``: Mei-model validity mask PNG from a KITTI-360 fisheye
                   calib yaml (pixels whose inverse mirror projection has a
                   real solution, reference ``mei_fisheye_utils.py:86-120``)
- ``nuscenes``   : official devkit train/val scene splits minus rain/night ->
                   ``nusc_train.txt`` / ``nusc_val.txt``
                   (lines ``token,prev_token,next_token``)
- ``nusc-json``  : JSON-ified fast dataset (image paths, P2, relative poses,
                   static filtering) for ``NusceneJsonDataset``
- ``eigen``      : copy + checksum the KITTI eigen/eigen_zhou split files from
                   a monodepth2/FSNet checkout. These splits are fixed
                   research artifacts (Eigen NIPS'14 test list; Zhou CVPR'17
                   static-scene-filtered train list); they are not derivable
                   from the raw data, so "generation" means verified import.

Usage:
    python scripts/generate_meta_data.py kitti360 --root /data/KITTI-360
    python scripts/generate_meta_data.py fisheye-mask \
        --calib /data/KITTI-360/calibration/image_02.yaml --height 1400 --width 1400
    python scripts/generate_meta_data.py nuscenes --root /data/nuscene
    python scripts/generate_meta_data.py nusc-json --root /data/nuscene \
        --split meta_data/nusc_trainsub/nusc_train.txt --channels CAM_FRONT
    python scripts/generate_meta_data.py eigen --src /path/to/fsnet/meta_data
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

META = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "meta_data")


# -------------------------------------------------------------------- KITTI-360

def gen_kitti360(root: str, out_dir: str, split_ratio: float = 0.8,
                 seed: int = 0) -> None:
    """Seeded sequence-level 80/20 split; one line per keyframe with existing
    (prev, cur, next) rectified cam0 images (notebook ``read_kitti360.ipynb``:
    same seed-0 permutation and line format)."""
    image_dir = os.path.join(root, "data_2d_raw")
    pose_dir = os.path.join(root, "data_poses")

    sequences = sorted(os.listdir(pose_dir))
    rng = np.random.RandomState(seed)
    perm = rng.permutation(len(sequences))
    n_train = int(split_ratio * len(sequences))
    splits = {"train": perm[:n_train], "val": perm[n_train:]}

    os.makedirs(out_dir, exist_ok=True)
    for split, seq_idx in splits.items():
        lines = []
        for si in seq_idx:
            seq = sequences[si]
            pose_file = os.path.join(pose_dir, seq, "cam0_to_world.txt")
            if not os.path.isfile(pose_file):
                continue
            with open(pose_file) as f:
                keys = [int(line.strip().split(" ")[0]) for line in f]
            img_root = os.path.join(image_dir, seq, "image_00", "data_rect")
            for i in range(1, len(keys) - 1):
                trip = (keys[i], keys[i - 1], keys[i + 1])
                if all(os.path.isfile(os.path.join(img_root, f"{k:010d}.png"))
                       for k in trip):
                    lines.append(f"{seq},{i},{trip[0]},{trip[1]},{trip[2]}\n")
        out = os.path.join(out_dir, f"kitti360_{split}.txt")
        with open(out, "w") as f:
            f.writelines(lines)
        print(f"{out}: {len(lines)} samples from {len(seq_idx)} sequences")


def gen_fisheye_mask(calib_path: str, height: int, width: int,
                     out_path: str) -> None:
    """Validity mask of the Mei inverse projection: white where the
    backtracked viewing ray exists (the bisection solve of the mirror
    equation has a sign change), black elsewhere. The reference ships this
    as a hand-checked PNG; here it is derived from the calib itself via
    ``ops/fisheye.backtrack_ray_map``."""
    import cv2

    from fsnet_tpu.data.datasets.fisheye_dataset import (
        extract_P_from_fisheye_calib, read_fisheycalib,
    )
    from fsnet_tpu.ops.fisheye import backtrack_ray_map

    calib = read_fisheycalib(calib_path)
    P = extract_P_from_fisheye_calib(calib)
    xi = calib["mirror_parameters"]["xi"]
    k1 = calib["distortion_parameters"]["k1"]
    k2 = calib["distortion_parameters"]["k2"]
    _, _, _, valid = backtrack_ray_map(height, width, np.asarray(P),
                                       xi, k1, k2)
    mask = (valid[0] > 0.5).astype(np.uint8) * 255
    cv2.imwrite(out_path, mask)
    print(f"{out_path}: {mask.mean() / 255:.1%} valid")


# -------------------------------------------------------------------- NuScenes

def _nusc(root: str, version: str):
    from nuscenes.nuscenes import NuScenes

    return NuScenes(version=version, dataroot=root, verbose=False)


def gen_nuscenes(root: str, out_dir: str,
                 version: str = "v1.0-trainval") -> None:
    """Official devkit scene splits, rain/night scenes dropped, walked into
    (token, prev, next) triplets (notebook ``read_nuscnes.ipynb``)."""
    from nuscenes.utils.splits import create_splits_scenes

    nusc = _nusc(root, version)
    scene_splits = create_splits_scenes()
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val"):
        lines = []
        for scene in nusc.scene:
            desc = scene["description"].lower()
            if "rain" in desc or "night" in desc:
                continue
            if scene["name"] not in scene_splits[split]:
                continue
            prior = ""
            token = scene["first_sample_token"]
            for _ in range(scene["nbr_samples"]):
                sample = nusc.get("sample", token)
                if sample["next"] == "":
                    break
                if prior == "":
                    prior, token = token, sample["next"]
                    continue
                lines.append(f"{token},{prior},{sample['next']}\n")
                prior, token = token, sample["next"]
        out = os.path.join(out_dir, f"nusc_{split}.txt")
        with open(out, "w") as f:
            f.writelines(lines)
        print(f"{out}: {len(lines)} samples")


def gen_nusc_json(root: str, split_file: str, out_path: str,
                  channels, version: str = "v1.0-trainval",
                  filter_static_threshold: float = 0.03) -> None:
    """Precompute the fast JSON dataset consumed by ``NusceneJsonDataset``:
    per (sample, camera) the three image paths, P2, both relative poses and
    the static flag (notebook ``json_from_cfg.ipynb``; consumed by
    ``nuscene_dataset.NusceneJsonDataset``)."""
    from fsnet_tpu.data.datasets.nuscene_dataset import NusceneDepthMonoDataset
    from fsnet_tpu.data.datasets.io_utils import cam_relative_pose_nusc

    nusc = _nusc(root, version)
    with open(split_file) as f:
        token_list = [line.strip().split(",") for line in f if line.strip()]

    get_int = NusceneDepthMonoDataset.get_intrinsic
    get_ext = NusceneDepthMonoDataset.get_extrinsic
    get_pose = NusceneDepthMonoDataset.get_ego_pose

    samples_out = []
    n_static = 0
    for tokens in token_list:
        samples = [nusc.get("sample", t) for t in tokens]
        for ci, cam in enumerate(channels):
            cam_datas = [nusc.get("sample_data", s["data"][cam])
                         for s in samples]
            cs = [nusc.get("calibrated_sensor", c["calibrated_sensor_token"])
                  for c in cam_datas]
            egos = [nusc.get("ego_pose", c["ego_pose_token"])
                    for c in cam_datas]
            paths = [os.path.join(root, c["filename"]) for c in cam_datas]
            P2 = get_int(cs[0])
            exts = [get_ext(c) for c in cs]
            poses = [get_pose(e) for e in egos]
            rel = [cam_relative_pose_nusc(poses[0], poses[i],
                                          np.linalg.inv(exts[0])).astype(
                                              np.float32)
                   for i in (1, 2)]
            trans = [float(np.linalg.norm(r[0:3, 3])) for r in rel]
            if min(trans) < filter_static_threshold:
                n_static += 1
                continue  # static samples dropped up front (notebook + the
                # raw dataset's is_filter_static resampling semantics)
            # schema consumed by NusceneJsonDataset.__getitem__: image-path
            # keys frame0/frame1/frame-1, pose01/pose0-1 row-major 4x4 lists,
            # P2 a flat 3x3, camera_type(+_indexes) for the per-channel masks
            samples_out.append({
                "frame0": paths[0], "frame1": paths[1], "frame-1": paths[2],
                "P2": np.asarray(P2, np.float32)[:3, :3].reshape(-1).tolist(),
                "pose01": rel[0].reshape(-1).tolist(),
                "pose0-1": rel[1].reshape(-1).tolist(),
                "camera_type_indexes": ci,
                "camera_type": cam,
            })
    out = dict(cfg=dict(split_file=split_file, channels=list(channels),
                        version=version), samples=samples_out)
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"{out_path}: {len(samples_out)} samples ({n_static} static dropped)")


# -------------------------------------------------------------------- eigen

EIGEN_FILES = {
    "eigen_zhou/train_files.txt": 39810,
    "eigen_zhou/val_files.txt": 4424,
    "eigen/test_files.txt": 697,
}


def import_eigen(src: str, out_root: str = META) -> None:
    """Verified import of the fixed eigen/eigen_zhou split artifacts from a
    monodepth2 ('splits/' layout) or FSNet ('meta_data/' layout) checkout.
    Checks the canonical line counts before installing."""
    import shutil

    for rel, expect in EIGEN_FILES.items():
        for candidate in (os.path.join(src, rel),
                          os.path.join(src, "splits", rel)):
            if os.path.isfile(candidate):
                break
        else:
            print(f"MISSING in {src}: {rel} — skipped")
            continue
        with open(candidate) as f:
            n = sum(1 for line in f if line.strip())
        tag = "ok" if n == expect else f"WARNING: expected {expect}"
        dst = os.path.join(out_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(candidate, dst)
        print(f"{dst}: {n} lines ({tag})")


# ------------------------------------------------------------------------ CLI

def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    k = sub.add_parser("kitti360")
    k.add_argument("--root", required=True)
    k.add_argument("--out", default=os.path.join(META, "kitti360_trainsub"))
    k.add_argument("--split_ratio", type=float, default=0.8)
    k.add_argument("--seed", type=int, default=0)

    fm = sub.add_parser("fisheye-mask")
    fm.add_argument("--calib", required=True)
    fm.add_argument("--height", type=int, default=1400)
    fm.add_argument("--width", type=int, default=1400)
    fm.add_argument("--out", default=os.path.join(
        META, "kitti360_trainsub", "fisheye_mask.png"))

    n = sub.add_parser("nuscenes")
    n.add_argument("--root", required=True)
    n.add_argument("--out", default=os.path.join(META, "nusc_trainsub"))
    n.add_argument("--version", default="v1.0-trainval")

    nj = sub.add_parser("nusc-json")
    nj.add_argument("--root", required=True)
    nj.add_argument("--split", required=True)
    nj.add_argument("--out", default=os.path.join(
        META, "nusc_trainsub", "json_nusc_front_train.json"))
    nj.add_argument("--channels", nargs="+", default=["CAM_FRONT"])
    nj.add_argument("--version", default="v1.0-trainval")

    e = sub.add_parser("eigen")
    e.add_argument("--src", required=True,
                   help="monodepth2 or FSNet checkout containing the splits")

    args = p.parse_args()
    if args.cmd == "kitti360":
        gen_kitti360(args.root, args.out, args.split_ratio, args.seed)
    elif args.cmd == "fisheye-mask":
        gen_fisheye_mask(args.calib, args.height, args.width, args.out)
    elif args.cmd == "nuscenes":
        gen_nuscenes(args.root, args.out, args.version)
    elif args.cmd == "nusc-json":
        gen_nusc_json(args.root, args.split, args.out, args.channels,
                      args.version)
    elif args.cmd == "eigen":
        import_eigen(args.src)


if __name__ == "__main__":
    main()
