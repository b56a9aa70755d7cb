"""Multi-host execution: region sharding over JAX processes.

The reference's single-node thread pool (BS_thread_pool over regions,
src/assemble.cpp:43) becomes, at pod scale:

  host h processes the h-th block of BED regions  (DCN-free data parallelism
  over independent regions — the recovery unit is a region, matching the
  reference's restartability semantics, SURVEY.md §5)
  each host's chips run the batched pair dispatches over its own mesh (ICI)
  outputs: each host emits its region block in order to its own stream;
  concatenating per-host outputs in host order reproduces the single-host
  byte stream (region order is preserved within and across blocks).

``maybe_initialize()`` is a no-op outside a multi-process environment, so
all workloads transparently run single-host too.
"""

from __future__ import annotations

import os
import sys
from typing import List, Sequence, Tuple

from ..utils.timestamp import antimestamp


def maybe_initialize() -> Tuple[int, int]:
    """Initialize jax.distributed when a coordinator is configured; returns
    (process_index, process_count).

    Explicit topology via JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID (works on any backend, including CPU processes); with
    only a coordinator address set, jax's own cluster auto-detection
    (SLURM/TPU pod metadata) fills in the rest."""
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    if addr:
        kwargs = {}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs = dict(
                coordinator_address=addr,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as e:  # already initialized or misconfigured
            sys.stderr.write(
                f"({antimestamp()}): [WARNING] jax.distributed.initialize: {e}\n")
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_regions(regions: Sequence, process_index: int,
                  process_count: int) -> List:
    """Contiguous block partition of regions across processes (keeps output
    order reconstructible by concatenation in process order)."""
    n = len(regions)
    base = n // process_count
    extra = n % process_count
    start = process_index * base + min(process_index, extra)
    size = base + (1 if process_index < extra else 0)
    return list(regions[start : start + size])
