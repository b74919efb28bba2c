"""Native .npz weight serialization + golden-activation fixture anchors.

The golden fixtures (pretrained/golden_*.npz) are produced by
scripts/convert_weights.py from the REAL public checkpoints; when
present, the parity tests here anchor our pure-JAX networks to
activations captured from genuine weights instead of hand-transcribed
torch modules. In the zero-egress container they are absent and the
fixture tests skip.
"""

import os

import numpy as np
import pytest


def test_pytree_npz_roundtrip(tmp_path):
    import jax.numpy as jnp

    from fourdgs.perception.weights_io import load_pytree_npz, save_pytree_npz

    params = {
        "enc": {
            "conv1": {"w": np.random.rand(3, 3, 4, 8).astype(np.float32),
                      "b": np.zeros(8, np.float32)},
            "blocks": [
                {"w": np.ones((2, 2), np.float32)},
                {"w": np.full((2, 2), 2.0, np.float32)},
            ],
        },
        "head.weight": np.arange(6, dtype=np.float32).reshape(2, 3),
    }
    p = str(tmp_path / "w.npz")
    save_pytree_npz(p, params, meta={"cfg": {"nc": 80, "scales": [1, 2]}})
    loaded, meta = load_pytree_npz(p)

    assert meta == {"cfg": {"nc": 80, "scales": [1, 2]}}
    assert set(loaded) == {"enc", "head.weight"}
    np.testing.assert_array_equal(
        np.asarray(loaded["head.weight"]), params["head.weight"]
    )
    np.testing.assert_array_equal(
        np.asarray(loaded["enc"]["conv1"]["w"]), params["enc"]["conv1"]["w"]
    )
    assert isinstance(loaded["enc"]["blocks"], list)
    assert len(loaded["enc"]["blocks"]) == 2
    np.testing.assert_array_equal(
        np.asarray(loaded["enc"]["blocks"][1]["w"]),
        params["enc"]["blocks"][1]["w"],
    )
    assert isinstance(loaded["enc"]["conv1"]["w"], jnp.ndarray)


def test_pytree_npz_flat_keys_with_dots(tmp_path):
    """YOLO state_dict keys contain dots ('model.0.conv.weight') — they
    must survive as single flat keys, not be split into nesting."""
    from fourdgs.perception.weights_io import load_pytree_npz, save_pytree_npz

    params = {"model.0.conv.weight": np.random.rand(4, 4).astype(np.float32)}
    p = str(tmp_path / "w.npz")
    save_pytree_npz(p, params, meta={"cfg": {}})
    loaded, _ = load_pytree_npz(p)
    assert list(loaded) == ["model.0.conv.weight"]


GOLDEN_DIR = "pretrained"


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"golden_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent (scripts/convert_weights.py not run — "
                    "no checkpoint files in this container)")
    return np.load(path)


def test_raft_matches_golden_activations():
    import jax.numpy as jnp

    from fourdgs.perception.raft import load_torch_weights, raft_forward

    g = _golden("raft")
    params = load_torch_weights(os.path.join(GOLDEN_DIR, "raft-things.npz"))
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 255, (1, 3, 64, 96)), jnp.float32)
    flow = np.asarray(raft_forward(params, x1, x2, iters=6))
    np.testing.assert_allclose(flow, g["flow"], rtol=1e-4, atol=1e-4)


def test_yolov9_matches_golden_activations():
    from fourdgs.perception.yolov9 import load_yolov9

    g = _golden("yolov9")
    model = load_yolov9(os.path.join(GOLDEN_DIR, "yolov9e-seg.npz"),
                        imgsz=320)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 3, 320, 320)).astype(np.float32)
    boxes, scores, mcs, protos = model.forward(model.params, img)
    np.testing.assert_allclose(
        np.asarray(boxes[0]), g["boxes"], rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(protos[0]), g["protos"], rtol=1e-4, atol=1e-3
    )


def test_lpips_matches_golden_value():
    import jax.numpy as jnp

    from fourdgs.eval.lpips import load_weights, lpips_pair

    g = _golden("lpips")
    w = load_weights(os.path.join(GOLDEN_DIR, "lpips_alex.npz"))
    assert w is not None
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)), jnp.float32)
    assert abs(float(lpips_pair(w, a, b)) - float(g["value"])) < 1e-4
