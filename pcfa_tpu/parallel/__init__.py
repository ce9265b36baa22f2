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

Spatial (context-parallel analog) sharding — designed, not yet built
(SURVEY.md §2.6: "design for it, don't build it in v0"): for frames large
enough that the all-pairs correlation volume O((HW/64)²) outgrows one
chip's HBM, extend the mesh to ('data', 'space') and shard the FIRST HW
axis of the volume. `allpairs_correlation` then computes per-shard
`f1_shard · f2ᵀ` with f2 ring-gathered over ICI (`jax.lax.ppermute` ring,
or all_gather for small f2); `corr_lookup_mm` stays shard-local because
each query position's window reads only its own row of the volume. The
convolutional encoders/GRU shard along H with halo exchange
(`ppermute` of the conv receptive-field rows). KITTI/Sintel at ÷8 are
≤48×156 positions (~220 MB volume), so single-chip residency wins today;
the sharded path becomes profitable around 4× those dimensions.
"""

from pcfa_tpu.parallel.mesh import data_mesh
from pcfa_tpu.parallel.dp import pcfa_attack_dp, universal_batch_attack_dp
