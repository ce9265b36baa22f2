from pcfa_tpu.ops.warp import (
    coords_grid,
    grid_sample,
    bilinear_sampler,
    interpolate_bilinear,
    avg_pool2d,
    upflow,
    resample2d,
)
from pcfa_tpu.ops.correlation import (
    allpairs_correlation,
    corr_pyramid,
    corr_pyramid_pooled,
    resolve_corr_impl,
    corr_lookup,
    corr_lookup_gather,
    corr_lookup_mm,
    corr_lookup_window,
    local_correlation,
    global_correlation,
)
from pcfa_tpu.ops.channelnorm import channel_norm

__all__ = [
    "coords_grid",
    "grid_sample",
    "bilinear_sampler",
    "interpolate_bilinear",
    "avg_pool2d",
    "upflow",
    "resample2d",
    "allpairs_correlation",
    "corr_pyramid",
    "corr_pyramid_pooled",
    "resolve_corr_impl",
    "corr_lookup",
    "corr_lookup_gather",
    "corr_lookup_mm",
    "corr_lookup_window",
    "local_correlation",
    "global_correlation",
    "channel_norm",
]
