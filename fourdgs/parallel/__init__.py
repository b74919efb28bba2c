from fourdgs.parallel.mesh import make_mesh  # noqa: F401
from fourdgs.parallel.sharded import (  # noqa: F401
    sharded_map_step,
    batch_render_sharded,
)
