from fourdgs.perception.flow import (  # noqa: F401
    FlowCache,
    compute_fwdbwd_mask,
    normalize_flow,
    warp_flow,
)
