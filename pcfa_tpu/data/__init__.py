"""Data layer: dataset indexers, synthetic data, and the input pipeline.

Rebuild of `helper_functions/datasets.py` + `prepare_dataloader`
(`ownutilities.py:171-238`) with an additional procedural `Synthetic` dataset
so tests/CI never need a KITTI/Sintel download (SURVEY.md §4 item 3).
"""

from pcfa_tpu.data.synthetic import SyntheticDataset
from pcfa_tpu.data.datasets import KITTI, FlowSample, MpiSintel
from pcfa_tpu.data.loader import prepare_dataloader
