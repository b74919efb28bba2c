"""YOLOv9-seg instance segmentation as a pure-JAX inference graph.

The reference attaches the external `ultralytics` package
(/root/reference/slam.py:80 `YOLO('pretrained/yolov9e-seg.pt')`) and runs
it per frame inside the dataset fetch (utils/dataset.py:352-373) to build
`motion_mask` from person (class 0) / chair (56) / clock (74) / teddy
(77) detections. This module folds that inference into the same JAX
process instead (BASELINE north star: YOLO "into the same JAX inference
graph"): a functional re-implementation of the YOLOv9 module set
(GELAN/CB blocks + the v8-style Segment head) executing the model layout
described by the ultralytics config embedded in the checkpoint itself,
with `convert_state_dict` mapping the torch weights 1:1.

Structure:
  - module primitives (`conv_bn_act`, `rep_ncspelan4`, `adown`,
    `sppelan`, `cb_linear`, `cb_fuse`, `segment_head`, ...) — each
    numerically parity-tested against a torch transcription in
    tests/test_yolov9_parity.py (ultralytics itself is not installed in
    this container; full-checkpoint parity is additionally covered when
    the package + weights are available),
  - `build_model(cfg, nc)` interprets the ultralytics model list
    ([from, repeats, module, args]) and returns a jittable
    `forward(params, image) -> (feats, seg_outputs)`,
  - `convert_checkpoint(path)` loads an ultralytics .pt (torch pickle),
    extracts the yaml cfg + state_dict and converts to a flat dict of
    jnp arrays,
  - `Yolov9SegProvider` — drop-in motion-mask provider: letterbox,
    forward, host-side NMS, proto-mask composition, class filtering.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # ultralytics BatchNorm2d(eps=0.001)


# ---------------------------------------------------------------------------
# primitives (NCHW, OIHW — torch conventions so weights convert 1:1)
# ---------------------------------------------------------------------------

def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


def conv2d(x, w, b=None, stride=1, padding=None, groups=1, dilation=1):
    """torch.nn.Conv2d semantics: x (B,C,H,W), w (O,I/g,kh,kw)."""
    k = w.shape[2]
    p = autopad(k, padding, dilation)
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        rhs_dilation=(dilation, dilation),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def batch_norm(x, p, prefix):
    g = p[f"{prefix}.weight"]
    b = p[f"{prefix}.bias"]
    m = p[f"{prefix}.running_mean"]
    v = p[f"{prefix}.running_var"]
    inv = g / jnp.sqrt(v + BN_EPS)
    return x * inv[None, :, None, None] + (b - m * inv)[None, :, None, None]


def silu(x):
    return x * jax.nn.sigmoid(x)


def conv_bn_act(p, prefix, x, stride=1, padding=None, groups=1, act=True,
                dilation=1):
    """ultralytics Conv: Conv2d(bias=False) + BN + SiLU."""
    x = conv2d(
        x, p[f"{prefix}.conv.weight"], None, stride, padding, groups, dilation
    )
    x = batch_norm(x, p, f"{prefix}.bn")
    return silu(x) if act else x


def rep_convn(p, prefix, x, stride=1):
    """RepConvN (train-form): 3x3 Conv + 1x1 Conv branches, summed, SiLU.
    (conv1 = Conv(k=3, act=False), conv2 = Conv(k=1, act=False))."""
    y = conv_bn_act(p, f"{prefix}.conv1", x, stride, act=False)
    y = y + conv_bn_act(p, f"{prefix}.conv2", x, stride, padding=0, act=False)
    return silu(y)


def rep_n_bottleneck(p, prefix, x, shortcut=True):
    """RepNBottleneck: RepConvN(3) -> Conv(3), residual when shapes match."""
    y = rep_convn(p, f"{prefix}.cv1", x)
    y = conv_bn_act(p, f"{prefix}.cv2", y)
    if shortcut and x.shape[1] == y.shape[1]:
        y = x + y
    return y


def rep_ncsp(p, prefix, x, n=1):
    """RepNCSP: cv3(cat(bottlenecks(cv1(x)), cv2(x)))."""
    a = conv_bn_act(p, f"{prefix}.cv1", x, padding=0)
    for i in range(n):
        a = rep_n_bottleneck(p, f"{prefix}.m.{i}", a)
    b = conv_bn_act(p, f"{prefix}.cv2", x, padding=0)
    return conv_bn_act(p, f"{prefix}.cv3", jnp.concatenate([a, b], axis=1),
                       padding=0)


def rep_ncspelan4(p, prefix, x, n=1):
    """RepNCSPELAN4: cv1 -> chunk2 -> two (RepNCSP + Conv3) stages ->
    cv4(cat of all four)."""
    y = conv_bn_act(p, f"{prefix}.cv1", x, padding=0)
    c = y.shape[1] // 2
    ys = [y[:, :c], y[:, c:]]
    t = rep_ncsp(p, f"{prefix}.cv2.0", ys[-1], n)
    ys.append(conv_bn_act(p, f"{prefix}.cv2.1", t))
    t = rep_ncsp(p, f"{prefix}.cv3.0", ys[-1], n)
    ys.append(conv_bn_act(p, f"{prefix}.cv3.1", t))
    return conv_bn_act(p, f"{prefix}.cv4", jnp.concatenate(ys, axis=1),
                       padding=0)


def _avg_pool_2x1(x):
    """F.avg_pool2d(x, 2, 1, 0, ceil_mode=False, count_include_pad=True)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 1, 1), "VALID"
    ) / 4.0


def _max_pool(x, k, stride, pad):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, stride, stride),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )


def adown(p, prefix, x):
    """ADown: avg_pool(2,1) -> chunk2 -> [Conv3s2 | maxpool3s2 + Conv1]."""
    x = _avg_pool_2x1(x)
    c = x.shape[1] // 2
    x1 = conv_bn_act(p, f"{prefix}.cv1", x[:, :c], stride=2)
    x2 = _max_pool(x[:, c:], 3, 2, 1)
    x2 = conv_bn_act(p, f"{prefix}.cv2", x2, padding=0)
    return jnp.concatenate([x1, x2], axis=1)


def sppelan(p, prefix, x):
    """SPPELAN: cv1 + three stacked maxpool(5,1,2) + cv5(cat)."""
    y = [conv_bn_act(p, f"{prefix}.cv1", x, padding=0)]
    for _ in range(3):
        y.append(_max_pool(y[-1], 5, 1, 2))
    return conv_bn_act(p, f"{prefix}.cv5", jnp.concatenate(y, axis=1),
                       padding=0)


def cb_linear(p, prefix, x, c2s, stride=1):
    """CBLinear: plain biased conv, output split into the c2s chunks."""
    y = conv2d(x, p[f"{prefix}.conv.weight"], p[f"{prefix}.conv.bias"],
               stride)
    outs, o = [], 0
    for c in c2s:
        outs.append(y[:, o:o + c])
        o += c
    return outs


def _resize_nearest(x, h, w):
    b, c, h0, w0 = x.shape
    iy = (jnp.arange(h) * h0 // h).astype(jnp.int32)
    ix = (jnp.arange(w) * w0 // w).astype(jnp.int32)
    return x[:, :, iy][:, :, :, ix]


def cb_fuse(xs, idx):
    """CBFuse: nearest-resize the selected split of each CBLinear output
    to the last input's size and sum."""
    _, _, h, w = xs[-1].shape
    res = [_resize_nearest(x[idx[i]], h, w) for i, x in enumerate(xs[:-1])]
    return sum(res) + xs[-1]


def upsample2x(x):
    b, c, h, w = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


# ---------------------------------------------------------------------------
# Segment head (v8-style Detect + mask protos)
# ---------------------------------------------------------------------------

def proto(p, prefix, x):
    """Proto: Conv3 -> ConvTranspose2d(2,2) -> Conv3 -> Conv1."""
    x = conv_bn_act(p, f"{prefix}.cv1", x)
    w = p[f"{prefix}.upsample.weight"]         # (Cin, Cout, 2, 2)
    b = p[f"{prefix}.upsample.bias"]
    # ConvTranspose2d with kernel==stride==2, pad 0: each input pixel
    # expands to an independent 2x2 output block — one einsum (MXU) +
    # reshape, exactly torch semantics (no kernel flip ambiguity).
    bsz, _, h, wd = x.shape
    co = w.shape[1]
    x = jnp.einsum("bchw,cokl->bohkwl", x, w).reshape(bsz, co, 2 * h, 2 * wd)
    x = x + b[None, :, None, None]
    x = conv_bn_act(p, f"{prefix}.cv2", x)
    return conv_bn_act(p, f"{prefix}.cv3", x, padding=0)


def _detect_branch(p, prefix, x):
    """Sequential(Conv3, Conv3, Conv2d-1x1-biased)."""
    x = conv_bn_act(p, f"{prefix}.0", x)
    x = conv_bn_act(p, f"{prefix}.1", x)
    return conv2d(x, p[f"{prefix}.2.weight"], p[f"{prefix}.2.bias"])


def dfl(x, reg_max=16):
    """Distribution Focal Loss decode: softmax over reg_max bins ->
    expectation. x: (B, 4*reg_max, A) -> (B, 4, A)."""
    b, _, a = x.shape
    x = x.reshape(b, 4, reg_max, a)
    probs = jax.nn.softmax(x, axis=2)
    bins = jnp.arange(reg_max, dtype=x.dtype)
    return jnp.einsum("bkra,r->bka", probs, bins)


def make_anchors(shapes, strides, offset=0.5):
    """Per-level anchor centers (in feature cells) + per-anchor stride."""
    pts, strs = [], []
    for (h, w), s in zip(shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + offset
        sy = jnp.arange(h, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w,), float(s), jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def segment_head(p, prefix, feats, nc, nm=32, reg_max=16, strides=(8, 16, 32)):
    """Segment = Detect (cv2 box / cv3 cls) + cv4 mask coeffs + proto.
    Returns (boxes_xyxy (B,A,4) input px, scores (B,A,nc), coeffs
    (B,A,nm), protos (B,nm,Hp,Wp))."""
    protos = proto(p, f"{prefix}.proto", feats[0])
    boxes, clss, mcs, shapes = [], [], [], []
    for i, f in enumerate(feats):
        shapes.append(f.shape[2:])
        boxes.append(_detect_branch(p, f"{prefix}.cv2.{i}", f))
        clss.append(_detect_branch(p, f"{prefix}.cv3.{i}", f))
        mcs.append(_detect_branch(p, f"{prefix}.cv4.{i}", f))
    b = feats[0].shape[0]
    flat = lambda xs: jnp.concatenate(
        [x.reshape(b, x.shape[1], -1) for x in xs], axis=2
    )
    box_d = dfl(flat(boxes), reg_max)          # (B, 4, A) ltrb in cells
    cls = jax.nn.sigmoid(flat(clss))           # (B, nc, A)
    mc = flat(mcs)                             # (B, nm, A)
    anchors, strs = make_anchors(shapes, strides)
    lt, rb = box_d[:, :2], box_d[:, 2:]
    x1y1 = (anchors.T[None] - lt) * strs[None, None]
    x2y2 = (anchors.T[None] + rb) * strs[None, None]
    boxes_xyxy = jnp.concatenate([x1y1, x2y2], axis=1)  # (B, 4, A)
    return (
        boxes_xyxy.transpose(0, 2, 1),
        cls.transpose(0, 2, 1),
        mc.transpose(0, 2, 1),
        protos,
    )


# ---------------------------------------------------------------------------
# model builder: interprets the ultralytics cfg list
# ---------------------------------------------------------------------------

SUPPORTED = {
    "Silence", "Conv", "RepNCSPELAN4", "ADown", "SPPELAN", "CBLinear",
    "CBFuse", "Concat", "nn.Upsample", "Upsample", "Segment",
}


def build_model(cfg: dict, nc: int | None = None):
    """cfg: ultralytics model dict with 'backbone' + 'head' lists of
    [from, repeats, module, args]. Returns forward(params, x) ->
    (boxes, scores, mask_coeffs, protos); x is (B, 3, H, W) in [0,1].
    Layer indices (and thus weight prefixes `model.<i>.`) follow the
    list order exactly like ultralytics parse_model."""
    layers = list(cfg["backbone"]) + list(cfg["head"])
    nc = nc if nc is not None else int(cfg.get("nc", 80))

    def forward(p, x):
        outputs: list[Any] = []
        y = x
        for i, (frm, rep, mod, args) in enumerate(layers):
            prefix = f"model.{i}"
            src = (
                y if frm == -1 else
                [outputs[j] if j != -1 else y for j in frm]
                if isinstance(frm, (list, tuple)) else outputs[frm]
            )
            if mod == "Silence":
                y = src
            elif mod == "Conv":
                # ultralytics Conv args: [c2, k, s]
                s = args[2] if len(args) > 2 else 1
                y = conv_bn_act(p, prefix, src, stride=s)
            elif mod == "RepNCSPELAN4":
                n = int(args[3]) if len(args) > 3 else 1
                y = rep_ncspelan4(p, prefix, src, n=n)
            elif mod == "ADown":
                y = adown(p, prefix, src)
            elif mod == "SPPELAN":
                y = sppelan(p, prefix, src)
            elif mod == "CBLinear":
                y = cb_linear(p, prefix, src, args[0])
            elif mod == "CBFuse":
                y = cb_fuse(src, args[0])
            elif mod in ("nn.Upsample", "Upsample"):
                y = upsample2x(src)
            elif mod == "Concat":
                y = jnp.concatenate(src, axis=1)
            elif mod == "Segment":
                return segment_head(p, prefix, src, nc=nc)
            else:
                raise ValueError(f"unsupported module {mod}")
            outputs.append(y)
        raise ValueError("cfg has no Segment head")

    return forward


def convert_state_dict(sd) -> dict[str, jnp.ndarray]:
    """torch state_dict (or any name->tensor mapping) -> flat jnp dict.
    Names are kept verbatim (`model.<i>.<...>`); num_batches_tracked
    entries are dropped."""
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        arr = np.asarray(
            v.detach().cpu().numpy() if hasattr(v, "detach") else v,
            np.float32,
        )
        out[k] = jnp.asarray(arr)
    return out


def convert_checkpoint(path: str):
    """Load an ultralytics .pt checkpoint: returns (cfg dict, params).
    Requires torch to unpickle (inference itself is pure JAX)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    model = ckpt.get("model", ckpt.get("ema"))
    cfg = dict(model.yaml)
    sd = model.float().state_dict()
    return cfg, convert_state_dict(sd)


# ---------------------------------------------------------------------------
# host-side post-processing + provider
# ---------------------------------------------------------------------------

def nms_numpy(boxes, scores, iou_th=0.45, max_det=100):
    order = np.argsort(-scores)
    keep = []
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[order[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[order[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[order[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[order[1:], 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a_o = (boxes[order[1:], 2] - boxes[order[1:], 0]) * (
            boxes[order[1:], 3] - boxes[order[1:], 1]
        )
        iou = inter / np.maximum(a_i + a_o - inter, 1e-9)
        order = order[1:][iou <= iou_th]
    return np.asarray(keep, np.int64)


def _bilinear_sample(img: np.ndarray, ys: np.ndarray, xs: np.ndarray):
    """Separable bilinear sampling of (..., H, W) at float row coords ys
    (R,) and col coords xs (C,) -> (..., R, C). Half-pixel-center
    convention (cv2 INTER_LINEAR / torch align_corners=False)."""
    h, w = img.shape[-2], img.shape[-1]
    y0 = np.clip(np.floor(ys), 0, h - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs), 0, w - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)
    fx = np.clip(xs - x0, 0.0, 1.0)
    top = img[..., y0, :] * (1 - fy)[:, None] + img[..., y1, :] * fy[:, None]
    return (
        top[..., :, x0] * (1 - fx)[None, :]
        + top[..., :, x1] * fx[None, :]
    )


def letterbox(img_chw: np.ndarray, size: int = 640):
    """Resize-with-pad to (size, size); returns (image, scale, (dx, dy)).
    BILINEAR resize (the ultralytics loader uses cv2 INTER_LINEAR —
    nearest indexing produced aliased edges the torch model never sees at
    inference, flipping borderline detections)."""
    c, h, w = img_chw.shape
    r = min(size / h, size / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    ys = (np.arange(nh) + 0.5) / r - 0.5
    xs = (np.arange(nw) + 0.5) / r - 0.5
    resized = _bilinear_sample(img_chw, ys, xs).astype(np.float32)
    out = np.full((c, size, size), 0.447, np.float32)
    dy, dx = (size - nh) // 2, (size - nw) // 2
    out[:, dy:dy + nh, dx:dx + nw] = resized
    return out, r, (dx, dy)


class Yolov9Seg:
    """JAX YOLOv9-seg inference: image -> per-class instance masks."""

    def __init__(self, cfg: dict, params: dict, nc: int | None = None,
                 imgsz: int = 640):
        self.forward = jax.jit(build_model(cfg, nc))
        self.params = params
        self.imgsz = imgsz

    def segment(self, image_chw: np.ndarray, classes: list[int],
                conf: float = 0.25, iou: float = 0.45) -> np.ndarray:
        """image (3, H, W) float in [0,1] -> (H, W) bool union mask of the
        requested classes (the reference's motion-mask semantics,
        utils/dataset.py:352-373)."""
        c, h, w = image_chw.shape
        lb, r, (dx, dy) = letterbox(np.asarray(image_chw, np.float32),
                                    self.imgsz)
        boxes, scores, mcs, protos = self.forward(self.params, lb[None])
        boxes = np.asarray(boxes[0])
        scores = np.asarray(scores[0])
        mcs = np.asarray(mcs[0])
        protos_np = np.asarray(protos[0])          # (nm, Hp, Wp)
        cls_id = scores.argmax(axis=1)
        cls_sc = scores.max(axis=1)
        mask_out = np.zeros((h, w), bool)
        sel_all = (cls_sc >= conf) & np.isin(cls_id, classes)
        if not sel_all.any():
            return mask_out
        idx = np.nonzero(sel_all)[0]
        # PER-CLASS NMS (ultralytics offsets boxes by class id so boxes
        # of different classes never suppress each other — e.g. a person
        # sitting on a chair keeps both masks)
        off = (cls_id[idx, None] * 4096.0).astype(np.float32)
        keep = nms_numpy(boxes[idx] + off, cls_sc[idx], iou)
        nm, hp, wp = protos_np.shape
        for i in idx[keep]:
            m = 1.0 / (1.0 + np.exp(-(mcs[i] @ protos_np.reshape(nm, -1))))
            m = m.reshape(hp, wp)
            # proto grid -> letterbox px -> original px, BILINEAR like the
            # reference's F.interpolate mask upsampling (half-pixel centers)
            sy = self.imgsz / hp
            ys = ((np.arange(h) + 0.5) * r + dy) / sy - 0.5
            xs = ((np.arange(w) + 0.5) * r + dx) / sy - 0.5
            full = _bilinear_sample(m, ys, xs) > 0.5
            # crop to the detection box (original-image coordinates)
            x1 = int(max((boxes[i, 0] - dx) / r, 0))
            y1 = int(max((boxes[i, 1] - dy) / r, 0))
            x2 = int(min((boxes[i, 2] - dx) / r, w))
            y2 = int(min((boxes[i, 3] - dy) / r, h))
            crop = np.zeros_like(full)
            crop[y1:y2, x1:x2] = full[y1:y2, x1:x2]
            mask_out |= crop
        return mask_out


def load_yolov9(path: str, imgsz: int = 640) -> Yolov9Seg:
    """Accepts a converted .npz (torch-free; a sibling .npz of a .pt
    path is preferred when present) or the original ultralytics .pt."""
    import os

    npz = path[:-3] + ".npz" if path.endswith(".pt") else None
    if npz and os.path.exists(npz):
        path = npz
    if path.endswith(".npz"):
        from fourdgs.perception.weights_io import load_pytree_npz

        params, meta = load_pytree_npz(path)
        return Yolov9Seg(meta["cfg"], params, imgsz=imgsz)
    cfg, params = convert_checkpoint(path)
    return Yolov9Seg(cfg, params, imgsz=imgsz)
