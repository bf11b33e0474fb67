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

import os as _os

# The S=16 slab-GVA kernels (ops/pallas/gva_slab.py) allocate ~19M of
# scoped vmem at their TQ=128 tiling — above the 16M default. Appending
# the limit here (before libtpu initialises) raises it for every entry
# point; harmless on CPU and when libtpu is absent.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=24576"
if _VMEM_FLAG.split("=")[0] not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()
