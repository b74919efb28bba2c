"""Deform checkpoint: named artifact + shape-adaptive load
(reference deform_model.py:54-57 saves a named state_dict;
time_utils.py:863-883 loads shape-adaptively when node counts differ)."""

import jax
import jax.numpy as jnp
import numpy as np

from fourdgs.io.checkpoint import load_deform, save_deform
from fourdgs.models.deform import init_nodes
from fourdgs.slam.mapping_dynamic import init_deform_adam


def _make_deform(key, cap, n):
    pts = jax.random.uniform(key, (64, 3))
    mask = jnp.ones(64, bool)
    return init_nodes(key, cap, pts, mask, node_num=n)


def test_deform_roundtrip_named(tmp_path):
    cn = _make_deform(jax.random.key(0), 32, 16)
    adam = init_deform_adam(cn)
    adam = adam._replace(count=jnp.int32(7))
    p = str(tmp_path / "deform.npz")
    save_deform(p, cn, adam)

    # keys are named paths, not positional leaf.N
    data = np.load(p)
    assert any(k.startswith("deform.nodes") for k in data.files), data.files
    assert any("mlp" in k for k in data.files)

    cn2_tmpl = _make_deform(jax.random.key(1), 32, 16)
    adam2_tmpl = init_deform_adam(cn2_tmpl)
    cn2, adam2 = load_deform(p, cn2_tmpl, adam2_tmpl)
    for a, b in zip(jax.tree.leaves(cn), jax.tree.leaves(cn2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(adam2.count) == 7


def test_deform_load_shape_adaptive(tmp_path):
    """An artifact saved at a smaller node capacity loads into a larger
    template: the overlapping slots copy over, the rest keep template
    values (reference time_utils.py:863-883)."""
    small = _make_deform(jax.random.key(0), 16, 8)
    p = str(tmp_path / "deform_small.npz")
    save_deform(p, small)

    big_tmpl = _make_deform(jax.random.key(2), 48, 4)
    big, _ = load_deform(p, big_tmpl)
    np.testing.assert_allclose(
        np.asarray(big.nodes[:16]), np.asarray(small.nodes)
    )
    np.testing.assert_allclose(
        np.asarray(big.nodes[16:]), np.asarray(big_tmpl.nodes[16:])
    )
    np.testing.assert_array_equal(
        np.asarray(big.valid[:16]), np.asarray(small.valid)
    )
    # MLP weights have identical shapes regardless of node count
    for a, b in zip(jax.tree.leaves(small.mlp), jax.tree.leaves(big.mlp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
