"""ao_tpu — a TPU-native (JAX/XLA/Pallas/pjit) point-cloud perception framework.

Brand-new implementation with the capabilities of jihun1998/AO (a Pointcept
fork plus the CVPR 2024 "Artificial Oracle" weakly-supervised pipeline).
Reference layer map: /root/reference (see SURVEY.md). Nothing here is a
translation of the reference's CUDA/torch code: batches are fixed-shape
padded arrays with validity masks (instead of offset-packed ragged tensors),
point ops are XLA/Pallas kernels, and parallelism is a jax.sharding Mesh
instead of DDP/NCCL.
"""

__version__ = "0.1.0"
