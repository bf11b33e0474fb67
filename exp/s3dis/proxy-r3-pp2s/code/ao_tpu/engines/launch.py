"""Launch (reference: pointcept/engines/launch.py:36-137).

The reference spawns one process per GPU and initialises NCCL; JAX is
single-controller: one Python process drives all local devices, and
multi-host jobs call ``jax.distributed.initialize`` (coordinator address
from the environment or arguments). There is no mp.spawn, no local process
groups, no device pinning — the mesh in the trainer handles placement.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from ao_tpu.utils.logger import get_root_logger


def launch(
    main_func: Callable,
    num_devices_per_machine: Optional[int] = None,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    cfg=(),
):
    """Initialise (multi-host if configured) and run main_func(*cfg)."""
    import jax

    # The axon TPU plugin force-sets jax_platforms via jax.config at
    # interpreter start, so an env override must also go through config.
    # AO_PLATFORM=cpu (optionally with
    # XLA_FLAGS=--xla_force_host_platform_device_count=8) runs the whole
    # engine on a virtual CPU mesh.
    platform = os.environ.get("AO_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    if num_machines > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if dist_url and dist_url not in ("auto", None):
            coordinator = dist_url.replace("tcp://", "")
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
    if num_devices_per_machine is not None:
        n = jax.local_device_count()
        if num_devices_per_machine > n:
            get_root_logger().warning(
                f"requested {num_devices_per_machine} devices, only {n} present"
            )
    main_func(*cfg)
