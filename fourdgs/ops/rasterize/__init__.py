from fourdgs.ops.rasterize.api import RasterConfig, rasterize, render_flow  # noqa: F401
from fourdgs.ops.rasterize.oracle import RenderOutputs, composite_oracle  # noqa: F401
from fourdgs.ops.rasterize.preprocess import ScreenGaussians, preprocess  # noqa: F401
from fourdgs.ops.rasterize.binning import TileBins, bin_gaussians  # noqa: F401
