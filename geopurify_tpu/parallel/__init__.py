"""Device meshes, shardings, and collectives.

The reference's only distribution strategy is DDP + SyncBN + eval all_reduce
(SURVEY.md §2.4). Here that becomes: a (data, model) jax mesh; batch sharded on
`data` with psum'd grads (≙ DDP allreduce); BN moments pmean'd (≙ SyncBN); eval
histograms psum'd (≙ dist.all_reduce); and — beyond the reference — optional
tensor-parallel sharding of the frozen 2D teacher and point-dim sharding of the
lift/pooling kernels over `model` for scenes larger than one chip's HBM.
"""

from geopurify_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
