from fourdgs.ops.image import (  # noqa: F401
    image_gradient,
    image_gradient_mask,
    grad_intensity_mask,
    ssim,
    dilate3x3,
)
from fourdgs.ops.knn import knn_mean_sq_dist, knn_weights  # noqa: F401
