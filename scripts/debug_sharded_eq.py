"""Compare single-device vs mesh-sharded map_chunk after 1 iteration:
loss, param deltas, pose deltas. Diagnoses whether the sharded path is
exactly-equivalent-modulo-floats or semantically divergent."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, "/root/repo/tests")

from tests.test_mapping import CFG, INTR, _setup
from fourdgs.parallel import make_mesh
from fourdgs.slam.mapping import init_pose_adam, map_chunk

gmap, adam, store, img, depth = _setup()
mesh = make_mesh(8)
window_slots = jnp.array([0, 0], jnp.int32)
window_valid = jnp.array([True, False])
opt_pose = jnp.array([False, True])

for iters in (1, 3):
    args = (window_slots, window_valid, opt_pose, jnp.zeros(8, jnp.int32),
            jnp.int32(0), init_pose_adam(2), jax.random.key(5),
            jnp.int32(iters), jnp.int32(-1), jnp.int32(0), INTR, CFG)
    r1 = map_chunk(gmap, adam, store, *args)
    r8 = map_chunk(gmap, adam, store, *args, mesh=mesh)
    print(f"--- iters={iters}")
    print("loss", float(r1.final_loss), float(r8.final_loss),
          abs(float(r1.final_loss) - float(r8.final_loss)))
    for name, a, b in zip(
        r1.gmap.params._fields, jax.tree.leaves(r1.gmap.params),
        jax.tree.leaves(r8.gmap.params),
    ):
        d = np.abs(np.asarray(a) - np.asarray(b)).max()
        print(f"param {name}: maxdiff {d:.3e}")
    print("T_cw maxdiff", np.abs(np.asarray(r1.store.T_cw) - np.asarray(r8.store.T_cw)).max())
    print("exposure maxdiff", np.abs(np.asarray(r1.store.exposure) - np.asarray(r8.store.exposure)).max())
    print("denom maxdiff", np.abs(np.asarray(r1.gmap.denom) - np.asarray(r8.gmap.denom)).max())
    print("grad_accum maxdiff", np.abs(np.asarray(r1.gmap.grad_accum) - np.asarray(r8.gmap.grad_accum)).max())
