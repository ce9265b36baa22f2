"""Utilities: input padding, experiment tracking, profiling."""

from pcfa_tpu.utils.padder import InputPadder
from pcfa_tpu.utils.profiling import StepTimer, debug_nans, fetch_fence, trace
