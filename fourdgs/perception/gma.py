"""GMA optical flow (RAFT + Global Motion Aggregation) in pure JAX.

Re-implementation of the reference alternative flow network
(/root/reference/GMA/{network,gma}.py): the RAFT backbone (encoders,
correlation pyramid, SepConvGRU) plus a single-head attention module that
computes position-wise attention from CONTEXT features and aggregates
MOTION features globally; the aggregated features join the GRU input
(128 + 128 + 128 channels). Selectable in the reference's generate_flow
(utils/camera_utils.py:373, commented swap).

Shares all backbone ops with fourdgs.perception.raft.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fourdgs.perception.raft import (
    CDIM,
    HDIM,
    _conv,
    _coords_grid,
    _encoder,
    _fix_gru_shapes,
    _motion_features,
    _upsample_flow,
    conv2d,
    corr_lookup,
    corr_pyramid,
    encoder_forward,
)

CORR_LEVELS = 4
CORR_RADIUS = 4


def make_gma_params(key=None) -> dict:
    key = jax.random.key(0) if key is None else key
    ks = jax.random.split(key, 24)
    cor_planes = CORR_LEVELS * (2 * CORR_RADIUS + 1) ** 2
    dim_head = 128
    params = {
        "fnet": _encoder(ks[0], 256, "instance"),
        "cnet": _encoder(ks[1], HDIM + CDIM, "batch"),
        "att": {
            "to_qk": _conv(ks[2], CDIM, 2 * dim_head, 1),
            "gamma": jnp.zeros(()),
            "to_v": _conv(ks[3], HDIM, dim_head, 1),
            "project": None,  # GMA aggregate uses identity when dims match
        },
        "update": {
            "enc_convc1": _conv(ks[4], cor_planes, 256, 1),
            "enc_convc2": _conv(ks[5], 256, 192, 3),
            "enc_convf1": _conv(ks[6], 2, 128, 7),
            "enc_convf2": _conv(ks[7], 128, 64, 3),
            "enc_conv": _conv(ks[8], 192 + 64, 128 - 2, 3),
            "gru_convz1": None,
            "gru_convr1": None,
            "gru_convq1": None,
            "gru_convz2": None,
            "gru_convr2": None,
            "gru_convq2": None,
            "flow_conv1": _conv(ks[9], HDIM, 256, 3),
            "flow_conv2": _conv(ks[10], 256, 2, 3),
            "mask_conv1": _conv(ks[11], HDIM, 256, 3),
            "mask_conv2": _conv(ks[12], 256, 64 * 9, 1),
        },
    }
    params = _fix_gru_shapes(params, ks[13])
    # GMA's GRU consumes inp(128) + motion(128) + aggregated motion(128)
    cin = HDIM + 128 * 3
    gks = jax.random.split(ks[14], 6)
    for i, (name, kshape) in enumerate([
        ("gru_convz1", (1, 5)), ("gru_convr1", (1, 5)), ("gru_convq1", (1, 5)),
        ("gru_convz2", (5, 1)), ("gru_convr2", (5, 1)), ("gru_convq2", (5, 1)),
    ]):
        fan = cin * kshape[0] * kshape[1]
        params["update"][name] = {
            "weight": jax.random.normal(gks[i], (HDIM, cin) + kshape)
            * np.sqrt(2.0 / fan),
            "bias": jnp.zeros(HDIM),
        }
    return params


def global_attention(att, context):
    """(1, CDIM, H, W) context -> (HW, HW) attention (GMA/gma.py:34-80,
    single head, scaled dot product over all positions)."""
    qk = conv2d(att["to_qk"], context)
    c = qk.shape[1] // 2
    q, k = qk[:, :c], qk[:, c:]
    _, d, h, w = q.shape
    qf = q.reshape(d, h * w).T * (d ** -0.5)
    kf = k.reshape(d, h * w)
    return jax.nn.softmax(qf @ kf, axis=-1)  # (HW, HW)


def aggregate(att, attn, motion):
    """Aggregate motion features with the attention map and blend with the
    learned gamma residual (GMA/gma.py:82-123)."""
    v = conv2d(att["to_v"], motion)
    _, c, h, w = v.shape
    vf = v.reshape(c, h * w).T         # (HW, C)
    out = (attn @ vf).T.reshape(1, c, h, w)
    if att.get("project") is not None:
        out = conv2d(att["project"], out)
    return motion + att["gamma"] * out


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


@partial(jax.jit, static_argnames=("iters",))
def gma_forward(params, image1, image2, iters: int = 20):
    """image (1, 3, H, W) in [0, 255], H/W divisible by 8 ->
    (1, 2, H, W) flow."""
    img1 = 2.0 * (image1 / 255.0) - 1.0
    img2 = 2.0 * (image2 / 255.0) - 1.0
    fmap1 = encoder_forward(params["fnet"], img1)
    fmap2 = encoder_forward(params["fnet"], img2)
    pyramid = corr_pyramid(fmap1, fmap2)

    cnet = encoder_forward(params["cnet"], img1)
    net = jnp.tanh(cnet[:, :HDIM])
    inp = jax.nn.relu(cnet[:, HDIM:])
    attn = global_attention(params["att"], inp)

    _, _, h, w = fmap1.shape
    coords0 = _coords_grid(h, w)
    u = params["update"]

    def step(carry, _):
        net, coords1 = carry
        corr = corr_lookup(pyramid, coords1)
        flow = coords1 - coords0
        motion = _motion_features(u, flow, corr)
        motion_global = aggregate(params["att"], attn, motion)
        net2 = _gru(u, net, jnp.concatenate([inp, motion, motion_global], axis=1))
        df = conv2d(u["flow_conv2"], jax.nn.relu(conv2d(u["flow_conv1"], net2)))
        coords1 = coords1 + df
        mask = 0.25 * conv2d(
            u["mask_conv2"], jax.nn.relu(conv2d(u["mask_conv1"], net2))
        )
        return (net2, coords1), mask

    (net, coords1), masks = lax.scan(step, (net, coords0), None, length=iters)
    return _upsample_flow(coords1 - coords0, masks[-1])


# ---------------------------------------------------------------------------
# torch checkpoint conversion + provider
# ---------------------------------------------------------------------------

GMA_WEIGHTS_PATHS = [
    "pretrained/gma-things.npz",    # converted (scripts/convert_weights.py)
    "pretrained/gma-things.pth",
    os.path.expanduser("~/.cache/fourdgs/gma-things.npz"),
    os.path.expanduser("~/.cache/fourdgs/gma-things.pth"),
]


def convert_state_dict_gma(sd) -> dict:
    """Convert a torch RAFTGMA state_dict (reference GMA/network.py:29+,
    DataParallel 'module.' keys) into this module's parameter pytree.
    The aggregator's to_v/gamma live under update_block.aggregator, the
    attention's to_qk under att (GMA/gma.py:34-123; to_qk/to_v are
    bias-free convs). The relative-position embeddings (att.pos_emb.*)
    are unused with the reference's default args (position_only=False,
    position_and_content=False — network.py:45-46) and are skipped."""
    from fourdgs.perception.raft import (
        _strip_module,
        convert_encoder,
        convert_update_block,
        put_conv,
    )

    sd = _strip_module(sd)
    params = make_gma_params()
    convert_encoder(sd, params["fnet"], "fnet")
    convert_encoder(sd, params["cnet"], "cnet")
    convert_update_block(sd, params["update"])
    put_conv(sd, params["att"]["to_qk"], "att.to_qk")
    put_conv(sd, params["att"]["to_v"], "update_block.aggregator.to_v")
    params["att"]["gamma"] = jnp.asarray(
        np.asarray(sd["update_block.aggregator.gamma"]).reshape(())
    )
    if "update_block.aggregator.project.weight" in sd:
        params["att"]["project"] = {
            "weight": jnp.asarray(sd["update_block.aggregator.project.weight"]),
            "bias": jnp.zeros(sd["update_block.aggregator.project.weight"].shape[0]),
        }
    return params


def load_torch_weights_gma(path: str) -> dict:
    """Accepts a converted .npz (torch-free) or the original .pth."""
    if path.endswith(".npz"):
        from fourdgs.perception.weights_io import load_pytree_npz

        return load_pytree_npz(path)[0]
    import torch

    return convert_state_dict_gma(torch.load(path, map_location="cpu"))


class GmaFlowProvider:
    """GMA flow provider, selectable by the runner per config (the
    reference's generate_flow swap point, utils/camera_utils.py:368-407
    where the RAFT import can be replaced by GMA)."""

    def __init__(self, weights_path: str | None = None, iters: int = 12):
        from fourdgs.perception.raft import pad_to_multiple  # noqa: F401

        path = weights_path
        if path is None:
            for cand in GMA_WEIGHTS_PATHS:
                if os.path.exists(cand):
                    path = cand
                    break
        if path is None:
            raise FileNotFoundError(
                "gma-things.pth not found (no network egress to fetch it)"
            )
        self.params = load_torch_weights_gma(path)
        self.iters = iters

    def _run(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        from fourdgs.perception.raft import pad_to_multiple

        x1, (h, w) = pad_to_multiple(a[None] * 255.0)
        x2, _ = pad_to_multiple(b[None] * 255.0)
        flow = gma_forward(
            self.params, jnp.asarray(x1), jnp.asarray(x2), iters=self.iters
        )
        return np.asarray(flow[0, :, :h, :w]).transpose(1, 2, 0)

    def __call__(self, uid1, uid2, img1, img2):
        # fwd: pair->view, bwd: view->pair (see FlowCache)
        return self._run(img2, img1), self._run(img1, img2)
