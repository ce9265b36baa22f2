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
"""

from pcfa_tpu.parallel.mesh import data_mesh
from pcfa_tpu.parallel.dp import pcfa_attack_dp, universal_batch_attack_dp
