"""Rendering-quality evaluation over all frames.

Counterpart of reference eval_rendering (utils/eval_utils.py:300-428):
PSNR (masked to the union of valid pixels / static pixels in static
mode), SSIM, LPIPS and L1 depth, averaged over evaluated frames, dumped
to final_result.json. LPIPS needs pretrained AlexNet features which this
zero-egress image cannot fetch; when the torchmetrics checkpoint is
unavailable the field is reported as None (documented deviation).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from fourdgs.ops.image import psnr, ssim


_LPIPS = None


def _lpips_fn():
    """LPIPS(alex): the native JAX implementation (fourdgs/eval/lpips.py)
    when a weights file resolves (npz or converted torch checkpoint —
    see lpips.load_weights), else the torchmetrics fallback, else None."""
    global _LPIPS
    if _LPIPS is not None:
        return _LPIPS if _LPIPS != "unavailable" else None
    try:
        from fourdgs.eval.lpips import lpips_pair, load_weights

        w = load_weights()
        if w is not None:
            def fn(a: np.ndarray, b: np.ndarray) -> float:
                import jax.numpy as jnp

                return float(lpips_pair(
                    w, jnp.clip(jnp.asarray(a), 0, 1), jnp.clip(jnp.asarray(b), 0, 1)
                ))

            _LPIPS = fn
            return fn
    except Exception:
        pass
    try:
        import torch
        from torchmetrics.image.lpips import LearnedPerceptualImagePatchSimilarity

        metric = LearnedPerceptualImagePatchSimilarity(
            net_type="alex", normalize=True
        )

        def fn(a: np.ndarray, b: np.ndarray) -> float:
            ta = torch.from_numpy(a[None]).float()
            tb = torch.from_numpy(b[None]).float()
            return float(metric(ta.clamp(0, 1), tb.clamp(0, 1)))

        _LPIPS = fn
        return fn
    except Exception:
        _LPIPS = "unavailable"
        return None


def eval_rendering(
    render_fn,
    dataset,
    frame_ids: list[int],
    save_dir: str,
    label: str = "final",
    mask_dynamic: bool = False,
    interval: int = 1,
    dump_images: bool = False,
    novel_render_fn=None,
    dump_interval: int | None = None,
) -> dict:
    """render_fn(idx) -> (image (3,H,W), depth (H,W)) jnp arrays at the
    estimated pose for dataset frame idx.

    `interval` is the METRIC stride: the reference evaluates
    PSNR/SSIM/LPIPS/L1-depth on every frame (eval_utils.py:320 `for idx
    in range(0, end_idx)`; its `interval = 5` local at :311 is dead
    code), so production callers pass 1 — tests may subsample.
    `dump_interval` gates IMAGE DUMPS only, like the reference's
    `save_interval` ((idx + 1) % save_interval == 0 or idx == 0,
    eval_utils.py:346-351); None dumps every evaluated frame. With
    dump_images, frames (and novel views when novel_render_fn is given)
    are saved as PNGs under <save_dir>/renders/<label>/."""
    psnrs, ssims, lpipss, l1ds = [], [], [], []
    lpips = _lpips_fn()
    dump_dir = os.path.join(save_dir, "renders", label)
    if dump_images:
        os.makedirs(dump_dir, exist_ok=True)

    def _dump(name, img):
        from PIL import Image

        arr = np.clip(np.asarray(img), 0, 1)
        if arr.ndim == 3 and arr.shape[0] == 3:
            arr = arr.transpose(1, 2, 0)
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            os.path.join(dump_dir, name)
        )

    for idx in frame_ids[::interval]:
        gt_image, gt_depth, _, motion_mask = dataset[idx]
        img, depth = render_fn(idx)
        gt_image = jnp.asarray(gt_image)
        mask = jnp.asarray(gt_image).sum(axis=0) > 0.01
        if mask_dynamic:
            mask = mask & jnp.asarray(motion_mask)
        dump_this = dump_images and (
            not dump_interval                      # None/0: dump every frame
            or (idx + 1) % dump_interval == 0
            or idx == 0
        )
        if dump_this:
            _dump(f"{idx:05d}_render.png", img)
            _dump(f"{idx:05d}_gt.png", gt_image)
            if novel_render_fn is not None:
                nimg, _ = novel_render_fn(idx)
                _dump(f"{idx:05d}_novel.png", nimg)
        psnrs.append(float(psnr(jnp.clip(img, 0, 1), gt_image, mask)))
        ssims.append(float(ssim(jnp.clip(img, 0, 1), gt_image)))
        if lpips is not None:
            lpipss.append(lpips(np.clip(np.asarray(img), 0, 1), np.asarray(gt_image)))
        if gt_depth is not None:
            gtd = jnp.asarray(gt_depth)
            valid = (gtd > 0.01) & jnp.asarray(motion_mask)
            l1 = jnp.sum(jnp.abs(depth - gtd) * valid) / jnp.maximum(jnp.sum(valid), 1)
            l1ds.append(float(l1))

    out = {
        "mean_psnr": float(np.mean(psnrs)) if psnrs else None,
        "mean_ssim": float(np.mean(ssims)) if ssims else None,
        "mean_lpips": float(np.mean(lpipss)) if lpipss else None,
        "mean_l1_depth": float(np.mean(l1ds)) if l1ds else None,
        "frames": len(psnrs),
    }
    os.makedirs(os.path.join(save_dir, "psnr", label), exist_ok=True)
    with open(os.path.join(save_dir, "psnr", label, "final_result.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out
