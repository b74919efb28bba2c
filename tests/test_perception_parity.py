"""Numerical parity of the JAX RAFT/GMA re-implementations against the
REFERENCE torch networks (/root/reference/RAFT/raft.py:24,
/root/reference/GMA/network.py:29) with random weights: export the torch
state_dict, convert, and require forward agreement. This validates the
full converter path (incl. frozen batch-norm running stats in cnet) —
the public checkpoints load through exactly this code."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _randomize_bn(model, rng):
    """Randomize batch-norm running stats so conversion of the frozen
    stats is actually exercised (fresh BN has mean 0 / var 1, which an
    identity bug would pass)."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.from_numpy(rng.normal(0, 0.5, m.running_mean.shape[0]).astype(np.float32))
            )
            m.running_var.copy_(
                torch.from_numpy(rng.uniform(0.5, 2.0, m.running_var.shape[0]).astype(np.float32))
            )


def _images(rng, h=128, w=160):
    # the reference CorrBlock NaNs when a pyramid level collapses to 1
    # px (grid normalization divides by W-1); >=128 px keeps level 3 at
    # 2x2 so the torch reference stays in its valid domain
    a = rng.uniform(0, 255, (1, 3, h, w)).astype(np.float32)
    b = np.roll(a, 3, axis=3) * 0.95 + rng.uniform(0, 12, (1, 3, h, w)).astype(np.float32)
    return a, b.astype(np.float32)


@pytest.mark.slow
def test_raft_parity_vs_reference_torch():
    from RAFT.raft import RAFT

    import jax.numpy as jnp

    from fourdgs.perception.raft import convert_state_dict, raft_forward

    class A:
        small = False
        mixed_precision = False
        alternate_corr = False
        dropout = 0

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    model = RAFT(A())
    with torch.no_grad():
        _randomize_bn(model, rng)
    model.eval()

    a, b = _images(rng)
    with torch.no_grad():
        _, flow_t = model(
            torch.from_numpy(a), torch.from_numpy(b), iters=4, test_mode=True
        )
    params = convert_state_dict(model.state_dict())
    flow_j = raft_forward(params, jnp.asarray(a), jnp.asarray(b), iters=4)
    np.testing.assert_allclose(
        np.asarray(flow_j), flow_t.numpy(), atol=5e-3, rtol=1e-3
    )


@pytest.mark.slow
def test_gma_parity_vs_reference_torch():
    from GMA.network import RAFTGMA

    import jax.numpy as jnp

    from fourdgs.perception.gma import convert_state_dict_gma, gma_forward

    rng = np.random.default_rng(1)
    torch.manual_seed(1)
    model = RAFTGMA(None)
    with torch.no_grad():
        _randomize_bn(model, rng)
        # gamma initializes to 0 — set nonzero so the aggregation path
        # contributes to the output
        model.update_block.aggregator.gamma.fill_(0.7)
    model.eval()

    a, b = _images(rng)
    with torch.no_grad():
        _, flow_t = model(
            torch.from_numpy(a), torch.from_numpy(b), iters=4, test_mode=True
        )
    params = convert_state_dict_gma(model.state_dict())
    flow_j = gma_forward(params, jnp.asarray(a), jnp.asarray(b), iters=4)
    np.testing.assert_allclose(
        np.asarray(flow_j), flow_t.numpy(), atol=5e-3, rtol=1e-3
    )
