"""Multi-host execution: region sharding over JAX processes.

The reference's single-node thread pool (BS_thread_pool over regions,
src/assemble.cpp:43) becomes, at pod scale:

  host h processes the h-th block of BED regions  (DCN-free data parallelism
  over independent regions — the recovery unit is a region, matching the
  reference's restartability semantics, SURVEY.md §5)
  each host's chips run the batched pair dispatches over its own mesh (ICI)
  outputs: two modes —
    per-process streams (default): each host emits its region block in order
      to its own stream; concatenating per-host outputs in process order
      reproduces the single-host byte stream;
    writer-host gather (OTTER_TPU_GATHER=1): every host's block is gathered
      to process 0 with a process-level collective and emitted there as ONE
      stream — the TPU-native analog of the reference's mutex-serialized
      stdout sink (src/assemble.cpp:42,143-149).

``maybe_initialize()`` is a no-op outside a multi-process environment, so
all workloads transparently run single-host too.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..utils.timestamp import antimestamp


def _warn(msg: str) -> None:
    sys.stderr.write(f"({antimestamp()}): [WARNING] {msg}\n")


def _validated_topology() -> Optional[dict]:
    """Parse + validate the coordinator env; None means 'run single-process'
    (invalid configurations degrade with a warning instead of hanging —
    region independence makes single-process a correct, if slow, fallback).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    if not addr:
        return None
    kwargs: dict = {}
    nproc_s = os.environ.get("JAX_NUM_PROCESSES")
    if nproc_s:
        try:
            nproc = int(nproc_s)
        except ValueError:
            _warn(f"JAX_NUM_PROCESSES={nproc_s!r} is not an integer; "
                  "running single-process")
            return None
        if nproc <= 0:
            _warn(f"JAX_NUM_PROCESSES={nproc} must be >= 1; "
                  "running single-process")
            return None
        pid_s = os.environ.get("JAX_PROCESS_ID", "0")
        try:
            pid = int(pid_s)
        except ValueError:
            _warn(f"JAX_PROCESS_ID={pid_s!r} is not an integer; "
                  "running single-process")
            return None
        if not (0 <= pid < nproc):
            _warn(f"JAX_PROCESS_ID={pid} out of range for "
                  f"JAX_NUM_PROCESSES={nproc}; running single-process")
            return None
        kwargs = dict(coordinator_address=addr, num_processes=nproc,
                      process_id=pid)
    # bounded coordinator wait: a dead/unreachable coordinator must fail
    # the init (and degrade to single-process) instead of blocking the
    # whole run. jax's own initialization_timeout is no good here — its
    # distributed client LOG(FATAL)s the process on a deadline instead of
    # raising — so non-coordinator processes TCP-probe the address with
    # OUR timeout first and degrade with a warning if nothing listens.
    # LIMITATION: with cluster auto-detection (no JAX_NUM_PROCESSES) the
    # rank is unknown, and a rank-0 process probing its own yet-unbound
    # address would always fail — so the probe only runs for explicit
    # non-zero ranks; auto-detected topologies get jax's (bounded but
    # fatal) initialization_timeout instead.
    timeout_s = os.environ.get("OTTER_TPU_COORD_TIMEOUT_S")
    if timeout_s:
        try:
            t = max(1.0, float(timeout_s))
        except ValueError:
            _warn(f"OTTER_TPU_COORD_TIMEOUT_S={timeout_s!r} ignored "
                  "(not a number)")
        else:
            kwargs["initialization_timeout"] = int(t)
            if kwargs.get("process_id", 0) != 0 and \
                    not _coordinator_reachable(addr, t):
                _warn(f"coordinator {addr} unreachable after {t:.0f}s; "
                      "running single-process")
                return None
    return kwargs


def _coordinator_reachable(addr: str, timeout_s: float) -> bool:
    """Poll a TCP connect to host:port until it succeeds or the deadline
    passes (the coordinator may simply not be up yet)."""
    import socket
    import time

    host, _, port_s = addr.rpartition(":")
    try:
        port = int(port_s)
    except ValueError:
        return True  # let jax report the malformed address itself
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with socket.create_connection((host or "127.0.0.1", port),
                                          timeout=min(2.0, timeout_s)):
                return True
        except OSError:
            time.sleep(0.2)
    return False


def maybe_initialize() -> Tuple[int, int]:
    """Initialize jax.distributed when a coordinator is configured; returns
    (process_index, process_count).

    Explicit topology via JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID (works on any backend, including CPU processes); with
    only a coordinator address set, jax's own cluster auto-detection
    (SLURM/TPU pod metadata) fills in the rest. Invalid topology env or an
    unreachable coordinator (OTTER_TPU_COORD_TIMEOUT_S bounds the wait)
    degrade to single-process with a warning."""
    import jax

    kwargs = _validated_topology()
    if kwargs is not None:
        try:
            jax.distributed.initialize(**kwargs)
        except Exception as e:  # already initialized or misconfigured
            _warn(f"jax.distributed.initialize: {e}")
    try:
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def shard_regions(regions: Sequence, process_index: int,
                  process_count: int) -> List:
    """Contiguous block partition of regions across processes (keeps output
    order reconstructible by concatenation in process order). A process
    whose index is past the region count gets an EMPTY shard (it still
    participates in collectives, emitting nothing)."""
    n = len(regions)
    base = n // process_count
    extra = n % process_count
    start = process_index * base + min(process_index, extra)
    size = base + (1 if process_index < extra else 0)
    return list(regions[start : start + size])


def gather_enabled(process_count: int) -> bool:
    """Writer-host gather mode (OTTER_TPU_GATHER=1): emit the whole cohort
    stream from process 0 instead of per-process streams."""
    return process_count > 1 and os.environ.get("OTTER_TPU_GATHER") == "1"


def gather_text_to_writer(text: str, process_index: int,
                          process_count: int) -> Optional[str]:
    """Collective gather of per-process output blocks to the writer host.

    Every process contributes its region block (SAM/FASTA/VCF text, ASCII);
    process 0 receives the blocks concatenated in process order — byte-equal
    to the single-process stream — and every other process receives None.
    The analog of the reference's stdout mutex (assemble.cpp:42): ordered,
    single-sink emission, but over DCN process collectives
    (multihost_utils.process_allgather) instead of shared memory.

    Blocks are variable-length, so two collectives run: an allgather of
    lengths sizes the padded payload allgather. Cost is O(P * max_block)
    bytes over DCN — allele/VCF text is tiny next to the BAM inputs."""
    if process_count <= 1:
        return text
    from jax.experimental import multihost_utils

    data = np.frombuffer(text.encode("ascii"), dtype=np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.array([len(data)], dtype=np.int64))).reshape(-1)
    mx = int(lens.max())
    if mx == 0:
        return "" if process_index == 0 else None
    buf = np.zeros(mx, dtype=np.uint8)
    buf[: len(data)] = data
    blocks = np.asarray(multihost_utils.process_allgather(buf))
    blocks = blocks.reshape(process_count, mx)
    if process_index != 0:
        return None
    return b"".join(blocks[p, : int(lens[p])].tobytes()
                    for p in range(process_count)).decode("ascii")
