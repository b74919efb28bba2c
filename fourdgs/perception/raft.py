"""RAFT optical flow in pure JAX.

Re-implementation of the reference RAFT inference graph (/root/reference/
RAFT/{raft,extractor,corr,update}.py): twin residual encoders, all-pairs
4-level correlation pyramid with bilinear lookup (radius 4), a SepConvGRU
update block iterated `iters` times, and convex upsampling. Weight layout
matches the public raft-things.pth checkpoint via `load_torch_weights`
(torch is CPU-only in this image and used solely to unpickle the file);
without a checkpoint the module still runs (random init) so the plumbing
is testable — the zero-egress container cannot download weights.

All convs run through lax.conv_general_dilated in NCHW and jit cleanly;
the GRU loop is a lax.scan.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

HDIM = 128
CDIM = 128
CORR_LEVELS = 4
CORR_RADIUS = 4


# ---------------------------------------------------------------------------
# Parameter initialization (shapes match torch modules for conversion)
# ---------------------------------------------------------------------------


def _conv(key, cin, cout, k):
    fan_in = cin * k * k
    w = jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(2.0 / fan_in)
    return {"weight": w, "bias": jnp.zeros(cout)}


def _norm(c, kind: str):
    """Norm params: instance = affine only; batch = affine + frozen
    running stats (inference mode — RAFT freezes BN at eval,
    RAFT/raft.py:59-62); none = None."""
    if kind == "none":
        return None
    p = {"weight": jnp.ones(c), "bias": jnp.zeros(c)}
    if kind == "batch":
        p["mean"] = jnp.zeros(c)
        p["var"] = jnp.ones(c)
    return p


def _resblock(key, cin, cout, stride, norm: str = "instance"):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv(ks[0], cin, cout, 3),
        "conv2": _conv(ks[1], cout, cout, 3),
        "norm1": _norm(cout, norm),
        "norm2": _norm(cout, norm),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _conv(ks[2], cin, cout, 1)
        p["norm3"] = _norm(cout, norm)
    return p


def _encoder(key, out_dim, norm: str):
    """fnet uses instance norm, cnet BATCH norm (BasicEncoder norm_fn,
    RAFT/raft.py:54-55; GMA/network.py:57-58) — batch norms run frozen
    (eval mode) with converted running stats."""
    ks = jax.random.split(key, 9)
    return {
        "conv1": _conv(ks[0], 3, 64, 7),
        "norm1": _norm(64, norm),
        "layer1": [_resblock(ks[1], 64, 64, 1, norm), _resblock(ks[2], 64, 64, 1, norm)],
        "layer2": [_resblock(ks[3], 64, 96, 2, norm), _resblock(ks[4], 96, 96, 1, norm)],
        "layer3": [_resblock(ks[5], 96, 128, 2, norm), _resblock(ks[6], 128, 128, 1, norm)],
        "conv2": _conv(ks[7], 128, out_dim, 1),
    }


def init_raft_params(key=None) -> dict:
    key = jax.random.key(0) if key is None else key
    ks = jax.random.split(key, 16)
    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2  # 324
    return {
        "fnet": _encoder(ks[0], 256, "instance"),
        "cnet": _encoder(ks[1], HDIM + CDIM, "batch"),
        "update": {
            "enc_convc1": _conv(ks[2], cor_planes, 256, 1),
            "enc_convc2": _conv(ks[3], 256, 192, 3),
            "enc_convf1": _conv(ks[4], 2, 128, 7),
            "enc_convf2": _conv(ks[5], 128, 64, 3),
            "enc_conv": _conv(ks[6], 192 + 64, 128 - 2, 3),
            # (1,5)/(5,1) kernels filled in by _fix_gru_shapes
            "gru_convz1": None,
            "gru_convr1": None,
            "gru_convq1": None,
            "gru_convz2": None,
            "gru_convr2": None,
            "gru_convq2": None,
            "flow_conv1": _conv(ks[13], HDIM, 256, 3),
            "flow_conv2": _conv(ks[14], 256, 2, 3),
            "mask_conv1": _conv(ks[15], HDIM, 256, 3),
            "mask_conv2": _conv(jax.random.key(7), 256, 64 * 9, 1),
        },
    }


def _fix_gru_shapes(params, key=None):
    """GRU convs are (1,5)/(5,1); fill in their weight shapes."""
    u = params["update"]
    cin = HDIM + 256
    key = jax.random.key(11) if key is None else key
    ks = jax.random.split(key, 6)
    for i, (name, kshape) in enumerate([
        ("gru_convz1", (1, 5)), ("gru_convr1", (1, 5)), ("gru_convq1", (1, 5)),
        ("gru_convz2", (5, 1)), ("gru_convr2", (5, 1)), ("gru_convq2", (5, 1)),
    ]):
        fan = cin * kshape[0] * kshape[1]
        u[name] = {
            "weight": jax.random.normal(ks[i], (HDIM, cin) + kshape)
            * np.sqrt(2.0 / fan),
            "bias": jnp.zeros(HDIM),
        }
    return params


def make_params(key=None) -> dict:
    return _fix_gru_shapes(init_raft_params(key))


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------


def conv2d(p, x, stride=1, padding=None):
    """torch-semantics conv: explicit symmetric k//2 padding. XLA's
    "SAME" pads asymmetrically for stride>1 ((lo, hi) = (2, 3) for a
    7x7/2 conv) while torch pads (3, 3) — that one-pixel misalignment
    breaks checkpoint parity in every strided conv."""
    kh, kw = p["weight"].shape[2], p["weight"].shape[3]
    if padding is None:
        padding = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    out = lax.conv_general_dilated(
        x, p["weight"], (stride, stride), padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + p["bias"][None, :, None, None]


def apply_norm(p, x, eps=1e-5):
    """Instance norm, or frozen (eval-mode) batch norm when running
    stats are present in the params."""
    if "mean" in p:
        mean = p["mean"][None, :, None, None]
        var = p["var"][None, :, None, None]
    else:
        mean = jnp.mean(x, axis=(2, 3), keepdims=True)
        var = jnp.var(x, axis=(2, 3), keepdims=True)
    xn = (x - mean) * lax.rsqrt(var + eps)
    return xn * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _apply_res(p, x):
    # stride-2 blocks are exactly the ones with a downsample branch in
    # RAFT's BasicEncoder config (static structure, not a traced value)
    stride = 2 if "downsample" in p else 1
    y = conv2d(p["conv1"], x, stride=stride)
    y = jax.nn.relu(apply_norm(p["norm1"], y) if p["norm1"] is not None else y)
    y = conv2d(p["conv2"], y)
    y = jax.nn.relu(apply_norm(p["norm2"], y) if p["norm2"] is not None else y)
    if "downsample" in p:
        x = conv2d(p["downsample"], x, stride=stride)
        if p.get("norm3") is not None:
            x = apply_norm(p["norm3"], x)
    return jax.nn.relu(x + y)


def encoder_forward(p, x):
    x = conv2d(p["conv1"], x, stride=2)
    if p["norm1"] is not None:
        x = apply_norm(p["norm1"], x)
    x = jax.nn.relu(x)
    for blk in p["layer1"]:
        x = _apply_res(blk, x)
    for blk in p["layer2"]:
        x = _apply_res(blk, x)
    for blk in p["layer3"]:
        x = _apply_res(blk, x)
    return conv2d(p["conv2"], x)


def corr_pyramid(fmap1, fmap2):
    """All-pairs correlation + avg-pool pyramid (RAFT/corr.py:12-60).
    fmap: (1, 256, H, W). Returns list of (H*W, 1, Hl, Wl)."""
    _, c, h, w = fmap1.shape
    f1 = fmap1.reshape(c, h * w).T          # (HW, C)
    f2 = fmap2.reshape(c, h * w)            # (C, HW)
    corr = (f1 @ f2) / jnp.sqrt(jnp.float32(c))  # (HW, HW) — MXU
    corr = corr.reshape(h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(CORR_LEVELS - 1):
        corr = lax.reduce_window(
            corr, 0.0, lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        ) / 4.0
        pyramid.append(corr)
    return pyramid


def bilinear_sample(img, coords):
    """img (N, C, H, W), coords (N, P, 2) xy -> (N, C, P), zero padded."""
    n, c, h, w = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def gather(xi, yi):
        xi_c = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        yi_c = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        flat = yi_c * w + xi_c                       # (N, P)
        imgf = img.reshape(n, c, h * w)
        out = jnp.take_along_axis(imgf, flat[:, None, :], axis=2)
        return out * valid[:, None, :]

    v00 = gather(x0, y0)
    v01 = gather(x0, y0 + 1)
    v10 = gather(x0 + 1, y0)
    v11 = gather(x0 + 1, y0 + 1)
    dxe = dx[:, None, :]
    dye = dy[:, None, :]
    return (
        v00 * (1 - dxe) * (1 - dye)
        + v10 * dxe * (1 - dye)
        + v01 * (1 - dxe) * dye
        + v11 * dxe * dye
    )


def corr_lookup(pyramid, coords):
    """coords (1, 2, H, W) -> (1, 324, H, W)."""
    _, _, h, w = coords.shape
    cgrid = coords.transpose(0, 2, 3, 1).reshape(h * w, 1, 2)  # (HW, 1, 2)
    r = CORR_RADIUS
    # RAFT's delta grid (corr.py:37-39) is meshgrid(dy, dx) stacked last,
    # i.e. flat channel c = i*(2r+1)+j samples (x + (i - r), y + (j - r))
    # — the x offset rides the SLOW index. Converted update-block weights
    # expect exactly this channel order.
    ar = jnp.arange(-r, r + 1, dtype=jnp.float32)
    d = jnp.stack(jnp.meshgrid(ar, ar, indexing="ij"), axis=-1).reshape(-1, 2)
    outs = []
    for lvl, corr in enumerate(pyramid):
        centroid = cgrid / (2.0**lvl)
        pts = centroid + d[None, :, :]      # (HW, 81, 2)
        sampled = bilinear_sample(corr, pts)  # (HW, 1, 81)
        outs.append(sampled[:, 0, :])
    feat = jnp.concatenate(outs, axis=-1)   # (HW, 324)
    return feat.reshape(1, h, w, -1).transpose(0, 3, 1, 2)


def _gru(u, h, x):
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(conv2d(u["gru_convz1"], hx))
    r = jax.nn.sigmoid(conv2d(u["gru_convr1"], hx))
    q = jnp.tanh(conv2d(u["gru_convq1"], jnp.concatenate([r * h, x], axis=1)))
    h = (1 - z) * h + z * q
    hx = jnp.concatenate([h, x], axis=1)
    z = jax.nn.sigmoid(conv2d(u["gru_convz2"], hx))
    r = jax.nn.sigmoid(conv2d(u["gru_convr2"], hx))
    q = jnp.tanh(conv2d(u["gru_convq2"], jnp.concatenate([r * h, x], axis=1)))
    return (1 - z) * h + z * q


def _motion_features(u, flow, corr):
    c = jax.nn.relu(conv2d(u["enc_convc1"], corr))
    c = jax.nn.relu(conv2d(u["enc_convc2"], c))
    f = jax.nn.relu(conv2d(u["enc_convf1"], flow))
    f = jax.nn.relu(conv2d(u["enc_convf2"], f))
    out = jax.nn.relu(conv2d(u["enc_conv"], jnp.concatenate([c, f], axis=1)))
    return jnp.concatenate([out, flow], axis=1)  # 128


def _coords_grid(h, w):
    y, x = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([x, y])[None]  # (1, 2, H, W)


def _upsample_flow(flow, mask):
    """Convex 8x upsampling (RAFT/raft.py:73-85)."""
    n, _, h, w = flow.shape
    mask = mask.reshape(n, 1, 9, 8, 8, h, w)
    mask = jax.nn.softmax(mask, axis=2)
    # unfold 3x3 neighborhoods of 8*flow
    fpad = jnp.pad(8.0 * flow, ((0, 0), (0, 0), (1, 1), (1, 1)))
    patches = jnp.stack(
        [
            fpad[:, :, dy:dy + h, dx:dx + w]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=2,
    )  # (N, 2, 9, H, W)
    up = jnp.sum(mask * patches[:, :, :, None, None], axis=2)  # (N,2,8,8,H,W)
    up = up.transpose(0, 1, 4, 2, 5, 3)  # N,2,H,8,W,8
    return up.reshape(n, 2, 8 * h, 8 * w)


@partial(jax.jit, static_argnames=("iters",))
def raft_forward(params, image1, image2, iters: int = 20):
    """image: (1, 3, H, W) in [0, 255]. H, W divisible by 8.
    Returns full-resolution flow (1, 2, H, W)."""
    img1 = 2.0 * (image1 / 255.0) - 1.0
    img2 = 2.0 * (image2 / 255.0) - 1.0
    fmap1 = encoder_forward(params["fnet"], img1)
    fmap2 = encoder_forward(params["fnet"], img2)
    pyramid = corr_pyramid(fmap1, fmap2)

    cnet = encoder_forward(params["cnet"], img1)
    net = jnp.tanh(cnet[:, :HDIM])
    inp = jax.nn.relu(cnet[:, HDIM:])

    _, _, h, w = fmap1.shape
    coords0 = _coords_grid(h, w)
    u = params["update"]

    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(pyramid, coords1)
        flow = coords1 - coords0
        motion = _motion_features(u, flow, corr)
        net2 = _gru(u, net, jnp.concatenate([inp, motion], axis=1))
        df = conv2d(u["flow_conv2"], jax.nn.relu(conv2d(u["flow_conv1"], net2)))
        coords1 = coords1 + df
        mask = 0.25 * conv2d(
            u["mask_conv2"], jax.nn.relu(conv2d(u["mask_conv1"], net2))
        )
        return (net2, coords1), mask

    (net, coords1), masks = lax.scan(step, (net, coords0), None, length=iters)
    flow_lr = coords1 - coords0
    return _upsample_flow(flow_lr, masks[-1])


# ---------------------------------------------------------------------------
# torch checkpoint conversion + provider
# ---------------------------------------------------------------------------

RAFT_WEIGHTS_PATHS = [
    "pretrained/raft-things.npz",   # converted (scripts/convert_weights.py)
    "pretrained/raft-things.pth",
    os.path.expanduser("~/.cache/fourdgs/raft-things.npz"),
    os.path.expanduser("~/.cache/fourdgs/raft-things.pth"),
]


def _strip_module(sd) -> dict:
    return {k.replace("module.", ""): np.asarray(v) for k, v in sd.items()}


def put_conv(sd, dst, prefix):
    dst["weight"] = jnp.asarray(sd[prefix + ".weight"])
    if prefix + ".bias" in sd:
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])


def put_norm(sd, dst, prefix):
    if prefix + ".weight" in sd and dst is not None:
        dst["weight"] = jnp.asarray(sd[prefix + ".weight"])
        dst["bias"] = jnp.asarray(sd[prefix + ".bias"])
        # batch norms carry running stats (cnet is norm_fn='batch',
        # RAFT/raft.py:55); frozen at inference like freeze_bn()
        if prefix + ".running_mean" in sd:
            dst["mean"] = jnp.asarray(sd[prefix + ".running_mean"])
            dst["var"] = jnp.asarray(sd[prefix + ".running_var"])


def convert_encoder(sd, e, enc_name: str) -> None:
    """Fill one BasicEncoder pytree from a torch state_dict (shared by
    RAFT and GMA — GMA/extractor.py is the same architecture)."""
    put_conv(sd, e["conv1"], f"{enc_name}.conv1")
    put_norm(sd, e["norm1"], f"{enc_name}.norm1")
    for li, lname in enumerate(["layer1", "layer2", "layer3"], start=1):
        for bi in range(2):
            blk = e[lname][bi]
            pre = f"{enc_name}.layer{li}.{bi}"
            put_conv(sd, blk["conv1"], pre + ".conv1")
            put_conv(sd, blk["conv2"], pre + ".conv2")
            put_norm(sd, blk["norm1"], pre + ".norm1")
            put_norm(sd, blk["norm2"], pre + ".norm2")
            if "downsample" in blk:
                put_conv(sd, blk["downsample"], pre + ".downsample.0")
                put_norm(sd, blk.get("norm3"), pre + ".downsample.1")
    put_conv(sd, e["conv2"], f"{enc_name}.conv2")


def convert_update_block(sd, u, prefix: str = "update_block") -> None:
    """Fill the update-block pytree (BasicMotionEncoder + SepConvGRU +
    FlowHead + mask head — RAFT/update.py, GMA/update.py share names)."""
    put_conv(sd, u["enc_convc1"], f"{prefix}.encoder.convc1")
    put_conv(sd, u["enc_convc2"], f"{prefix}.encoder.convc2")
    put_conv(sd, u["enc_convf1"], f"{prefix}.encoder.convf1")
    put_conv(sd, u["enc_convf2"], f"{prefix}.encoder.convf2")
    put_conv(sd, u["enc_conv"], f"{prefix}.encoder.conv")
    for g in ["convz1", "convr1", "convq1", "convz2", "convr2", "convq2"]:
        put_conv(sd, u[f"gru_{g}"], f"{prefix}.gru.{g}")
    put_conv(sd, u["flow_conv1"], f"{prefix}.flow_head.conv1")
    put_conv(sd, u["flow_conv2"], f"{prefix}.flow_head.conv2")
    put_conv(sd, u["mask_conv1"], f"{prefix}.mask.0")
    put_conv(sd, u["mask_conv2"], f"{prefix}.mask.2")


def convert_state_dict(sd) -> dict:
    """Convert a torch RAFT state_dict (DataParallel 'module.' keys
    already stripped or not) into this module's parameter pytree."""
    sd = _strip_module(sd)
    params = make_params()
    convert_encoder(sd, params["fnet"], "fnet")
    convert_encoder(sd, params["cnet"], "cnet")
    convert_update_block(sd, params["update"])
    return params


def load_torch_weights(path: str) -> dict:
    """Convert a torch RAFT checkpoint file into the parameter pytree.
    Accepts a converted .npz (torch-free) or the original .pth."""
    if path.endswith(".npz"):
        from fourdgs.perception.weights_io import load_pytree_npz

        return load_pytree_npz(path)[0]
    import torch

    return convert_state_dict(torch.load(path, map_location="cpu"))


def pad_to_multiple(img: np.ndarray, mult: int = 8):
    h, w = img.shape[-2:]
    ph = (-h) % mult
    pw = (-w) % mult
    return np.pad(img, ((0, 0), (0, 0), (0, ph), (0, pw)), mode="edge"), (h, w)


class RaftFlowProvider:
    """(uid1, uid2, img1, img2) -> (fwd, bwd) pixel flows, matching the
    reference generate_flow convention (fwd = img2->img1's frame ordering
    handled by the caller)."""

    def __init__(self, weights_path: str | None = None, iters: int = 20):
        path = weights_path
        if path is None:
            for cand in RAFT_WEIGHTS_PATHS:
                if os.path.exists(cand):
                    path = cand
                    break
        if path is None:
            raise FileNotFoundError(
                "raft-things.pth not found (no network egress to fetch it)"
            )
        self.params = load_torch_weights(path)
        self.iters = iters

    def _run(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        x1, (h, w) = pad_to_multiple(a[None] * 255.0)
        x2, _ = pad_to_multiple(b[None] * 255.0)
        flow = raft_forward(
            self.params, jnp.asarray(x1), jnp.asarray(x2), iters=self.iters
        )
        return np.asarray(flow[0, :, :h, :w]).transpose(1, 2, 0)

    def __call__(self, uid1, uid2, img1, img2):
        # fwd: pair->view, bwd: view->pair (see FlowCache)
        return self._run(img2, img1), self._run(img1, img2)
