"""Device-mesh parallelism for PCFA attacks.

The reference has NO distributed execution (SURVEY.md §2.6 — only a
single-process `torch.nn.DataParallel` wrapper whose practical effect is a
checkpoint key prefix). This package is the green-field TPU-native
equivalent:

* per-image attacks are embarrassingly parallel over image pairs →
  batch-shard over a 1-D `Mesh(('data',))` (`pcfa_attack_dp`);
* universal-δ training is the one true collective in the system: the δ
  gradient is a `lax.psum` over the data axis
  (`universal_batch_attack_dp`).

* spatial (context-parallel analog) sharding of the O((HW/64)²)
  all-pairs correlation volume over a `Mesh(('space',))` axis
  (`parallel/sp.py`, `spatial_flow_fn`): per-device row shards of
  `⟨f1, f2⟩`, shard-local `corr_lookup_mm`, one tiled `all_gather` of the
  small corr features per refinement iteration. KITTI/Sintel at ÷8 are
  ≤48×156 positions (~220 MB volume) so single-chip residency wins today;
  this path is for frames ~4× larger, where the volume outgrows one
  chip's HBM. Encoders/GRU stay replicated (HBM-light); sharding them
  along H with `ppermute` halo exchange is the designed next step.
"""

from pcfa_tpu.parallel.mesh import data_mesh
from pcfa_tpu.parallel.dp import (
    make_pcfa_attack_dp,
    pcfa_attack_dp,
    universal_batch_attack_dp,
)
from pcfa_tpu.parallel.sp import space_mesh, spatial_flow_fn
