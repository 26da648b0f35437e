"""Device-mesh helpers for multi-chip proving.

The reference's parallelism axes (SURVEY.md §2.4) map onto a 2-D mesh:
  * 'seg'  — segment/shard data-parallelism (independent proof units, the
             analogue of SP1 shards / RISC0 segments);
  * 'ntt'  — intra-proof model-parallelism: NTT rows / trace columns
             sharded across chips, butterfly exchanges riding ICI.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding"]


def make_mesh(n_seg: int | None = None, n_ntt: int | None = None,
              devices=None) -> Mesh:
    """Build a ('seg', 'ntt') mesh over the available devices.  With one
    device both axes are 1 (everything still works, just unsharded)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_seg is None and n_ntt is None:
        # favor the segment axis; keep ntt axis a power of two
        n_ntt = 1
        while n % 2 == 0 and n_ntt < 4:
            n //= 2
            n_ntt *= 2
        n_seg = len(devices) // n_ntt
    elif n_seg is None:
        n_seg = n // n_ntt
    elif n_ntt is None:
        n_ntt = n // n_seg
    if n_seg * n_ntt != len(devices):
        raise ValueError(
            f"mesh {n_seg}x{n_ntt} does not cover {len(devices)} devices")
    arr = np.array(devices).reshape(n_seg, n_ntt)
    return Mesh(arr, ("seg", "ntt"))
