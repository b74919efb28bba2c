"""Numerical parity of the JAX YOLOv9-seg modules against torch
transcriptions of the ultralytics module definitions (randomized weights
AND randomized BatchNorm running stats — same pattern as the RAFT/GMA
converter parity tests).

The `ultralytics` package is not installed in this container, so the
torch side here transcribes the public module math (Conv, RepConvN,
RepNCSP(ELAN4), ADown, SPPELAN, CBLinear/CBFuse, Proto, Segment
branches); when ultralytics + yolov9e-seg.pt are available,
fourdgs.perception.yolov9.convert_checkpoint loads the real thing
through the same converter (reference surface: /root/reference/slam.py:80,
utils/dataset.py:352-373)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from fourdgs.perception import yolov9 as y9

torch.manual_seed(0)


def autopad(k, p=None, d=1):
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class TConv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, p=None, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k, p), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class TRepConvN(nn.Module):
    def __init__(self, c1, c2, k=3, s=1):
        super().__init__()
        self.conv1 = TConv(c1, c2, k, s, act=False)
        self.conv2 = TConv(c1, c2, 1, s, p=0, act=False)
        self.act = nn.SiLU()

    def forward(self, x):
        return self.act(self.conv1(x) + self.conv2(x))


class TRepNBottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TRepConvN(c1, c_, 3, 1)
        self.cv2 = TConv(c_, c2, 3, 1)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        return x + self.cv2(self.cv1(x)) if self.add else self.cv2(self.cv1(x))


class TRepNCSP(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = TConv(c1, c_, 1, 1)
        self.cv2 = TConv(c1, c_, 1, 1)
        self.cv3 = TConv(2 * c_, c2, 1)
        self.m = nn.Sequential(*(TRepNBottleneck(c_, c_, e=1.0) for _ in range(n)))

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class TRepNCSPELAN4(nn.Module):
    def __init__(self, c1, c2, c3, c4, n=1):
        super().__init__()
        self.c = c3 // 2
        self.cv1 = TConv(c1, c3, 1, 1)
        self.cv2 = nn.Sequential(TRepNCSP(c3 // 2, c4, n), TConv(c4, c4, 3, 1))
        self.cv3 = nn.Sequential(TRepNCSP(c4, c4, n), TConv(c4, c4, 3, 1))
        self.cv4 = TConv(c3 + 2 * c4, c2, 1, 1)

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in [self.cv2, self.cv3])
        return self.cv4(torch.cat(y, 1))


class TADown(nn.Module):
    def __init__(self, c1, c2):
        super().__init__()
        self.c = c2 // 2
        self.cv1 = TConv(c1 // 2, self.c, 3, 2, 1)
        self.cv2 = TConv(c1 // 2, self.c, 1, 1, 0)

    def forward(self, x):
        x = F.avg_pool2d(x, 2, 1, 0, False, True)
        x1, x2 = x.chunk(2, 1)
        x1 = self.cv1(x1)
        x2 = F.max_pool2d(x2, 3, 2, 1)
        x2 = self.cv2(x2)
        return torch.cat((x1, x2), 1)


class TSPPELAN(nn.Module):
    def __init__(self, c1, c2, c3):
        super().__init__()
        self.cv1 = TConv(c1, c3, 1, 1)
        self.cv5 = TConv(4 * c3, c2, 1, 1)
        self.mp = nn.MaxPool2d(5, 1, 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.mp(y[-1]) for _ in range(3))
        return self.cv5(torch.cat(y, 1))


class TCBLinear(nn.Module):
    def __init__(self, c1, c2s, k=1, s=1):
        super().__init__()
        self.c2s = c2s
        self.conv = nn.Conv2d(c1, sum(c2s), k, s, autopad(k), bias=True)

    def forward(self, x):
        return self.conv(x).split(self.c2s, dim=1)


class TProto(nn.Module):
    def __init__(self, c1, c_=32, c2=16):
        super().__init__()
        self.cv1 = TConv(c1, c_, k=3)
        self.upsample = nn.ConvTranspose2d(c_, c_, 2, 2, 0, bias=True)
        self.cv2 = TConv(c_, c_, k=3)
        self.cv3 = TConv(c_, c2, k=1)

    def forward(self, x):
        return self.cv3(self.cv2(self.upsample(self.cv1(x))))


class TSegHead(nn.Module):
    """Torch transcription of the ultralytics Segment head branches
    (module-level so torch.save/load of checkpoints containing it can
    resolve the class by reference)."""

    def __init__(self, chs, nc, nm, reg_max=16, proto_mid=16):
        super().__init__()
        c2 = max(16, chs[0] // 4, reg_max * 4)
        c3 = max(chs[0], min(nc, 100))
        c4 = max(chs[0] // 4, nm)
        self.cv2 = nn.ModuleList(
            nn.Sequential(TConv(ch, c2, 3), TConv(c2, c2, 3),
                          nn.Conv2d(c2, 4 * reg_max, 1)) for ch in chs
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(TConv(ch, c3, 3), TConv(c3, c3, 3),
                          nn.Conv2d(c3, nc, 1)) for ch in chs
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(TConv(ch, c4, 3), TConv(c4, c4, 3),
                          nn.Conv2d(c4, nm, 1)) for ch in chs
        )
        self.proto = TProto(chs[0], proto_mid, nm)


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    mod.eval()
    return mod


def _convert(mod, prefix="model.0"):
    sd = {f"{prefix}.{k}": v for k, v in mod.state_dict().items()}
    return y9.convert_state_dict(sd)


def _cmp(tout, jout, tol=2e-4):
    t = tout.detach().numpy()
    j = np.asarray(jout)
    assert t.shape == j.shape, (t.shape, j.shape)
    err = np.abs(t - j).max() / max(np.abs(t).max(), 1e-6)
    assert err < tol, f"rel err {err}"


def _x(c, h=16, w=20):
    return torch.randn(1, c, h, w)


def test_conv_parity():
    m = _randomize_bn(TConv(8, 16, 3, 2))
    x = _x(8)
    _cmp(m(x), y9.conv_bn_act(_convert(m), "model.0", jnp.asarray(x.numpy()), stride=2))


def test_repncspelan4_parity():
    m = _randomize_bn(TRepNCSPELAN4(16, 32, 16, 8, n=2))
    x = _x(16)
    _cmp(m(x), y9.rep_ncspelan4(_convert(m), "model.0", jnp.asarray(x.numpy()), n=2))


def test_adown_parity():
    m = _randomize_bn(TADown(16, 24))
    x = _x(16)
    _cmp(m(x), y9.adown(_convert(m), "model.0", jnp.asarray(x.numpy())))


def test_sppelan_parity():
    m = _randomize_bn(TSPPELAN(16, 24, 8))
    x = _x(16)
    _cmp(m(x), y9.sppelan(_convert(m), "model.0", jnp.asarray(x.numpy())))


def test_cblinear_cbfuse_parity():
    m = _randomize_bn(TCBLinear(16, [4, 8]))
    x = _x(16)
    touts = m(x)
    jouts = y9.cb_linear(_convert(m), "model.0", jnp.asarray(x.numpy()), [4, 8])
    for t, j in zip(touts, jouts):
        _cmp(t, j)
    # CBFuse: nearest-resize + sum (torch F.interpolate ground truth)
    a = torch.randn(1, 4, 8, 10)
    b = torch.randn(1, 4, 4, 5)
    target = torch.randn(1, 4, 16, 20)
    fused_t = (
        F.interpolate(a, size=(16, 20), mode="nearest")
        + F.interpolate(b, size=(16, 20), mode="nearest")
        + target
    )
    fused_j = y9.cb_fuse(
        [[jnp.asarray(a.numpy())], [jnp.asarray(b.numpy())],
         jnp.asarray(target.numpy())],
        [0, 0],
    )
    _cmp(fused_t, fused_j)


def test_proto_parity():
    m = _randomize_bn(TProto(16, 12, 8))
    x = _x(16)
    _cmp(m(x), y9.proto(_convert(m), "model.0", jnp.asarray(x.numpy())))


def test_dfl_decode_matches_torch():
    """DFL: softmax over reg_max bins contracted with arange — transcribes
    ultralytics DFL (a fixed-weight 1x1 conv over the softmaxed bins)."""
    reg_max = 16
    x = torch.randn(2, 4 * reg_max, 21)
    xt = x.view(2, 4, reg_max, 21).transpose(1, 2)   # (b, reg_max, 4, a)
    probs = xt.softmax(1)
    w = torch.arange(reg_max, dtype=torch.float32)
    expect = torch.einsum("brka,r->bka", probs, w)
    got = y9.dfl(jnp.asarray(x.numpy()), reg_max)
    _cmp(expect, got)


def test_segment_head_parity():
    """Full Segment head on 3 random feature levels: detect/cls/mask
    branches + proto + anchor decode vs a torch transcription."""
    nc, nm, reg_max = 5, 8, 16
    chs = (16, 24, 32)

    m = _randomize_bn(TSegHead(chs, nc, nm))
    feats_t = [torch.randn(1, ch, 16 // (2 ** i), 20 // (2 ** i))
               for i, ch in enumerate(chs)]
    p = _convert(m, prefix="model.9")
    feats_j = [jnp.asarray(f.numpy()) for f in feats_t]
    boxes, scores, mcs, protos = y9.segment_head(
        p, "model.9", feats_j, nc=nc, nm=nm,
    )

    # torch-side expected values (transcribing Detect._inference)
    box_r, cls_r, mc_r, shapes = [], [], [], []
    for i, f in enumerate(feats_t):
        shapes.append(f.shape[2:])
        box_r.append(m.cv2[i](f).flatten(2))
        cls_r.append(m.cv3[i](f).flatten(2))
        mc_r.append(m.cv4[i](f).flatten(2))
    box_cat = torch.cat(box_r, 2)
    xt = box_cat.view(1, 4, reg_max, -1).transpose(1, 2)
    probs = xt.softmax(1)
    w = torch.arange(reg_max, dtype=torch.float32)
    box_d = torch.einsum("brka,r->bka", probs, w)
    anchors, strides = [], []
    for (h, wd), s in zip(shapes, (8, 16, 32)):
        sx = torch.arange(wd) + 0.5
        sy = torch.arange(h) + 0.5
        gy, gx = torch.meshgrid(sy, sx, indexing="ij")
        anchors.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        strides.append(torch.full((h * wd,), float(s)))
    anchors = torch.cat(anchors).T[None]
    strides = torch.cat(strides)[None, None]
    lt, rb = box_d[:, :2], box_d[:, 2:]
    exp_boxes = torch.cat(
        [(anchors - lt) * strides, (anchors + rb) * strides], 1
    ).transpose(1, 2)
    exp_scores = torch.cat(cls_r, 2).sigmoid().transpose(1, 2)
    exp_mcs = torch.cat(mc_r, 2).transpose(1, 2)
    exp_protos = m.proto(feats_t[0])

    _cmp(exp_boxes, boxes, tol=5e-4)
    _cmp(exp_scores, scores, tol=5e-4)
    _cmp(exp_mcs, mcs, tol=5e-4)
    _cmp(exp_protos, protos, tol=5e-4)


def test_tiny_full_model_via_cfg():
    """build_model interprets an ultralytics-style cfg list end-to-end;
    compared against manual torch execution of the same graph (exercises
    Silence/Conv/ELAN/ADown/CBLinear/CBFuse/SPPELAN/Upsample/Concat +
    Segment wiring and the `model.<i>.` weight naming)."""
    nc, nm = 3, 8
    cfg = {
        "nc": nc,
        "backbone": [
            [-1, 1, "Silence", []],             # 0
            [-1, 1, "Conv", [8, 3, 2]],         # 1
            [-1, 1, "RepNCSPELAN4", [16, 8, 4, 1]],  # 2
            [-1, 1, "ADown", [16]],             # 3
            [-1, 1, "RepNCSPELAN4", [24, 12, 6, 1]],  # 4
            [-1, 1, "ADown", [24]],             # 5
            [-1, 1, "SPPELAN", [24, 8]],        # 6
            [2, 1, "CBLinear", [[8]]],          # 7
            [0, 1, "Conv", [8, 3, 2]],          # 8
            [[7, 8], 1, "CBFuse", [[0]]],       # 9
        ],
        "head": [
            [6, 1, "nn.Upsample", [None, 2, "nearest"]],  # 10
            [[-1, 4], 1, "Concat", [1]],        # 11
            [-1, 1, "RepNCSPELAN4", [24, 12, 6, 1]],  # 12
            [[12, 6], 1, "Segment", [nc, nm, 16]],
        ],
    }

    convs = {}
    convs[1] = _randomize_bn(TConv(3, 8, 3, 2))
    convs[2] = _randomize_bn(TRepNCSPELAN4(8, 16, 8, 4, 1))
    convs[3] = _randomize_bn(TADown(16, 16))
    convs[4] = _randomize_bn(TRepNCSPELAN4(16, 24, 12, 6, 1))
    convs[5] = _randomize_bn(TADown(24, 24))
    convs[6] = _randomize_bn(TSPPELAN(24, 24, 8))
    convs[7] = _randomize_bn(TCBLinear(16, [8]))
    convs[8] = _randomize_bn(TConv(3, 8, 3, 2))
    convs[12] = _randomize_bn(TRepNCSPELAN4(48, 24, 12, 6, 1))

    chs = (24, 24)

    convs[13] = _randomize_bn(TSegHead(chs, nc, nm))

    sd = {}
    for i, mod in convs.items():
        for k, v in mod.state_dict().items():
            sd[f"model.{i}.{k}"] = v
    params = y9.convert_state_dict(sd)

    x = torch.rand(1, 3, 64, 80)
    with torch.no_grad():
        o0 = x
        o1 = convs[1](o0)
        o2 = convs[2](o1)
        o3 = convs[3](o2)
        o4 = convs[4](o3)
        o5 = convs[5](o4)
        o6 = convs[6](o5)
        o7 = convs[7](o2)
        o8 = convs[8](o0)
        o9 = F.interpolate(o7[0], size=o8.shape[2:], mode="nearest") + o8
        o10 = F.interpolate(o6, scale_factor=2, mode="nearest")
        o11 = torch.cat([o10, o4], 1)
        o12 = convs[12](o11)
        feats_t = [o12, o6]

    fwd = y9.build_model(cfg, nc=nc)
    boxes, scores, mcs, protos = fwd(params, jnp.asarray(x.numpy()))

    m = convs[13]
    box_r, cls_r, mc_r, shapes = [], [], [], []
    with torch.no_grad():
        for i, f in enumerate(feats_t):
            shapes.append(f.shape[2:])
            box_r.append(m.cv2[i](f).flatten(2))
            cls_r.append(m.cv3[i](f).flatten(2))
            mc_r.append(m.cv4[i](f).flatten(2))
        exp_protos = m.proto(feats_t[0])
    exp_scores = torch.cat(cls_r, 2).sigmoid().transpose(1, 2)
    exp_mcs = torch.cat(mc_r, 2).transpose(1, 2)

    _cmp(exp_scores, scores, tol=5e-4)
    _cmp(exp_mcs, mcs, tol=5e-4)
    _cmp(exp_protos, protos, tol=5e-4)
    assert np.isfinite(np.asarray(boxes)).all()


def _tiny_seg_model():
    """A tiny 4-layer cfg + randomized torch modules (shared by the
    provider tests)."""
    nc, nm = 2, 4
    cfg = {
        "nc": nc,
        "backbone": [
            [-1, 1, "Conv", [8, 3, 2]],          # 0
            [-1, 1, "Conv", [16, 3, 2]],         # 1
            [-1, 1, "ADown", [16]],              # 2
        ],
        "head": [
            [[1, 2], 1, "Segment", [nc, nm, 16]],
        ],
    }
    chs = (16, 16)

    mods = {
        0: _randomize_bn(TConv(3, 8, 3, 2)),
        1: _randomize_bn(TConv(8, 16, 3, 2)),
        2: _randomize_bn(TADown(16, 16)),
        3: _randomize_bn(TSegHead(chs, nc, nm, proto_mid=8)),
    }
    return cfg, mods


def test_mask_provider_end_to_end_shapes():
    """Yolov9Seg.segment: letterbox + NMS + proto composition produce a
    sane (H, W) bool mask on a tiny random model."""
    cfg, mods = _tiny_seg_model()
    sd = {}
    for i, mod in mods.items():
        for k, v in mod.state_dict().items():
            sd[f"model.{i}.{k}"] = v
    model = y9.Yolov9Seg(cfg, y9.convert_state_dict(sd), imgsz=64)
    img = np.random.default_rng(0).uniform(0, 1, (3, 48, 60)).astype(np.float32)
    mask = model.segment(img, classes=[0], conf=0.0)
    assert mask.shape == (48, 60) and mask.dtype == bool


class _FakeUltralyticsModel(nn.Module):
    """Minimal stand-in for the object stored in an ultralytics .pt:
    has .yaml, .float(), .state_dict() with `model.<i>.` key prefixes."""

    def __init__(self, cfg, mods_by_prefix):
        super().__init__()
        self.yaml = cfg
        self.model = nn.ModuleDict(
            {k.split(".")[1]: m for k, m in mods_by_prefix.items()}
        )

    def state_dict(self, *a, **kw):
        sd = {}
        for i, m in self.model.items():
            for k, v in m.state_dict().items():
                sd[f"model.{i}.{k}"] = v
        return sd


def test_provider_selection_prefers_jax_yolo(tmp_path):
    """make_segmenter picks the TPU-native Yolov9SegSegmenter whenever the
    checkpoint resolves (VERDICT r2 #4: JAX-first, ultralytics second,
    residual fallback last); convert_checkpoint round-trips the .pt."""
    cfg, mods = _tiny_seg_model()
    ckpt_path = tmp_path / "yolov9e-seg.pt"
    torch.save(
        {"model": _FakeUltralyticsModel(
            cfg, {f"model.{i}": m for i, m in mods.items()}
        )},
        ckpt_path,
    )

    from fourdgs.perception.segmentation import (
        MotionSegmenter,
        Yolov9SegSegmenter,
        make_segmenter,
    )
    from fourdgs.slam.camera import Intrinsics
    from fourdgs.utils.config import ConfigDict

    intr = Intrinsics(fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48)
    cfg_ok = ConfigDict.wrap(
        {"Dataset": {"yolo_weights": str(ckpt_path), "seg_chair": True}}
    )
    seg = make_segmenter(cfg_ok, intr)
    assert isinstance(seg, Yolov9SegSegmenter)
    assert seg.classes == [0, 56]
    mask = seg(np.zeros((48, 60, 3), np.uint8))
    assert mask.shape == (48, 60) and mask.dtype == bool

    cfg_missing = ConfigDict.wrap(
        {"Dataset": {"yolo_weights": str(tmp_path / "nope.pt")}}
    )
    assert isinstance(make_segmenter(cfg_missing, intr), MotionSegmenter)


def test_bilinear_sample_matches_torch_interpolate():
    """_bilinear_sample's half-pixel-center convention must match
    torch F.interpolate(mode='bilinear', align_corners=False) — the
    reference's letterbox (cv2 INTER_LINEAR) and proto-mask upsampling
    use exactly this mapping."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from fourdgs.perception.yolov9 import _bilinear_sample

    rng = np.random.default_rng(11)
    img = rng.uniform(size=(3, 24, 32)).astype(np.float32)
    oh, ow = 37, 51
    ys = (np.arange(oh) + 0.5) * (24 / oh) - 0.5
    xs = (np.arange(ow) + 0.5) * (32 / ow) - 0.5
    got = _bilinear_sample(img, ys, xs)
    want = F.interpolate(
        torch.from_numpy(img)[None], size=(oh, ow), mode="bilinear",
        align_corners=False,
    )[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
