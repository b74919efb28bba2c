"""One-shot weight conversion: public torch checkpoints -> native .npz.

Given any of the three public checkpoint files the reference pipeline
loads (utils/camera_utils.py:368-407 RAFT/GMA, slam.py:80 YOLOv9-seg,
plus the LPIPS-alex weights eval_utils.py uses via the `lpips` package),
this produces torch-free .npz artifacts the runtime loads directly, a
SHA256 manifest, and a small golden-activation fixture per network
(fixed random input -> output stats + a sliced activation block) that
tests/test_*_parity.py can anchor to instead of re-deriving torch
modules in-test.

Usage:
  python scripts/convert_weights.py \
      [--raft pretrained/raft-things.pth] \
      [--gma gma-things.pth] [--yolo yolov9e-seg.pt] \
      [--lpips lpips_alex.pth] [--out pretrained/]

Only the checkpoints you pass (or that exist at the default paths) are
converted; the container has no network egress, so fetch them elsewhere.
"""

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for blk in iter(lambda: f.read(1 << 20), b""):
            h.update(blk)
    return h.hexdigest()


def _fixture(out_dir: str, name: str, arrays: dict) -> str:
    path = os.path.join(out_dir, f"golden_{name}.npz")
    np.savez(path, **arrays)
    return path


def convert_raft(src: str, out_dir: str) -> dict:
    import jax.numpy as jnp

    from fourdgs.perception.raft import load_torch_weights, raft_forward
    from fourdgs.perception.weights_io import save_pytree_npz

    params = load_torch_weights(src)
    dst = os.path.join(out_dir, "raft-things.npz")
    save_pytree_npz(dst, params, meta={"source_sha256": sha256(src)})
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    flow = np.asarray(raft_forward(params, x1, x2, iters=6))
    fx = _fixture(out_dir, "raft", {
        "flow": flow, "mean": flow.mean(), "std": flow.std(),
    })
    return {"src": src, "dst": dst, "fixture": fx,
            "src_sha256": sha256(src), "dst_sha256": sha256(dst)}


def convert_gma(src: str, out_dir: str) -> dict:
    import jax.numpy as jnp

    from fourdgs.perception.gma import gma_forward, load_torch_weights_gma
    from fourdgs.perception.weights_io import save_pytree_npz

    params = load_torch_weights_gma(src)
    dst = os.path.join(out_dir, "gma-things.npz")
    save_pytree_npz(dst, params, meta={"source_sha256": sha256(src)})
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    flow = np.asarray(gma_forward(params, x1, x2, iters=6))
    fx = _fixture(out_dir, "gma", {
        "flow": flow, "mean": flow.mean(), "std": flow.std(),
    })
    return {"src": src, "dst": dst, "fixture": fx,
            "src_sha256": sha256(src), "dst_sha256": sha256(dst)}


def convert_yolo(src: str, out_dir: str) -> dict:
    from fourdgs.perception.weights_io import save_pytree_npz
    from fourdgs.perception.yolov9 import Yolov9Seg, convert_checkpoint

    cfg, params = convert_checkpoint(src)
    dst = os.path.join(out_dir, "yolov9e-seg.npz")
    save_pytree_npz(
        dst, params, meta={"cfg": cfg, "source_sha256": sha256(src)}
    )
    model = Yolov9Seg(cfg, params, imgsz=320)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 320, 320)).astype(np.float32)
    boxes, scores, mcs, protos = model.forward(params, img)
    fx = _fixture(out_dir, "yolov9", {
        "boxes": np.asarray(boxes[0]), "scores": np.asarray(scores[0]),
        "mask_coefs": np.asarray(mcs[0]), "protos": np.asarray(protos[0]),
        "input_seed": np.int64(0),
    })
    return {"src": src, "dst": dst, "fixture": fx,
            "src_sha256": sha256(src), "dst_sha256": sha256(dst)}


def convert_lpips(src: str, out_dir: str) -> dict:
    import jax.numpy as jnp

    from fourdgs.eval.lpips import load_weights, lpips_pair, save_weights

    w = load_weights(src)
    dst = os.path.join(out_dir, "lpips_alex.npz")
    save_weights(dst, w)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)), jnp.float32)
    val = float(lpips_pair(w, a, b))
    fx = _fixture(out_dir, "lpips", {"value": np.float64(val)})
    return {"src": src, "dst": dst, "fixture": fx,
            "src_sha256": sha256(src), "dst_sha256": sha256(dst)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raft", default="pretrained/raft-things.pth")
    ap.add_argument("--gma", default="pretrained/gma-things.pth")
    ap.add_argument("--yolo", default="pretrained/yolov9e-seg.pt")
    ap.add_argument("--lpips", default="pretrained/lpips_alex.pth")
    ap.add_argument("--out", default="pretrained")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    manifest = {}
    for name, src, fn in (
        ("raft", args.raft, convert_raft),
        ("gma", args.gma, convert_gma),
        ("yolov9", args.yolo, convert_yolo),
        ("lpips", args.lpips, convert_lpips),
    ):
        if not os.path.exists(src):
            print(f"[convert] {name}: {src} absent, skipped")
            continue
        print(f"[convert] {name}: {src} ...", flush=True)
        manifest[name] = fn(src, args.out)
        print(f"[convert] {name}: -> {manifest[name]['dst']} "
              f"sha256={manifest[name]['dst_sha256'][:16]}…")

    mpath = os.path.join(args.out, "MANIFEST.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"[convert] manifest: {mpath} ({len(manifest)} artifacts)")
    if not manifest:
        print("[convert] nothing converted (no checkpoint files found)")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
