from fourdgs.io.ply import load_gaussians_ply, save_gaussians_ply  # noqa: F401
from fourdgs.io.checkpoint import load_state, save_state  # noqa: F401
