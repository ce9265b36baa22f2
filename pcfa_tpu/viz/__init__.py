from pcfa_tpu.viz.flow_plot import (
    colorplot_light,
    colorplot_dark,
    errorplot,
    errorplot_Fl,
    middlebury_colorwheel,
)

__all__ = [
    "colorplot_light",
    "colorplot_dark",
    "errorplot",
    "errorplot_Fl",
    "middlebury_colorwheel",
]
