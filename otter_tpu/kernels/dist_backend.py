"""Device-batched distance backend for the assemble pipeline.

Replaces the reference's per-thread WFA loop (fill_dist_matrix,
src/analignments.cpp:117-124) with one batched banded-DP dispatch per region
(or per region batch): all End2End valid-pair distances are computed on
device as exact integers, and the float64 normalization (dist/longest,
analignments.cpp:68-72) happens on host so results are bit-identical to the
host path.

Ends-free alignments (only needed for non-spanning reads during
invalid_reassignment, analignments.cpp:83-99) stay on the host oracle for
now — they are O(invalid * alleles), far off the hot path.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax

from ..ops.consensus import get_dist_anreads
from ..ops.distmat import DistMatrix
from ..seqs.model import AnRead
from .edit_pallas import EditDistanceEngine


def _platform() -> str:
    try:
        return jax.devices()[0].platform
    except Exception:
        return "none"


class DeviceDistBackend:
    """Batched exact edit distances for region distance matrices."""

    def __init__(self, device: str = "auto", n_devices: int | None = None):
        plat = _platform()
        if device == "tpu" and plat not in ("tpu", "axon"):
            raise RuntimeError(f"TPU requested but platform is {plat}")
        mesh = None
        if device == "mesh":
            # explicit mesh execution: jnp dispatches with the pair axis
            # sharded over every attached device (works on virtual CPU
            # meshes too — the multi-chip validation path);
            # OTTER_TPU_MESH_DEVICES caps the device count
            import os

            from ..parallel.mesh import make_mesh
            if n_devices is None:
                n_devices = int(os.environ.get("OTTER_TPU_MESH_DEVICES",
                                               "0")) or None
            mesh = make_mesh(n_devices)
            mode = "jnp"
        elif device == "cpu":
            mode = "native"  # threaded C++ banded DP; numpy on build failure
        elif plat in ("tpu", "axon"):
            mode = "pallas"
        else:
            mode = "native"
        if mode == "native":
            try:
                from ..native import build_native
                build_native()
            except Exception:
                mode = "numpy"
        self.engine = EditDistanceEngine(mode=mode, mesh=mesh)

    # -- assemble hot path ---------------------------------------------------

    def fill_matrix(self, ignore_haps: bool, reads: List[AnRead],
                    indeces: List[int], distmatrix: DistMatrix) -> None:
        """Batched equivalent of fill_dist_matrix for valid (spanning) reads."""
        if not ignore_haps:
            # haplotag shortcut path has no alignment work; host loop
            for i in range(len(indeces)):
                for j in range(i + 1, len(indeces)):
                    distmatrix.set_dist(
                        i, j, get_dist_anreads(False, reads[indeces[i]],
                                               reads[indeces[j]]))
            return
        pairs = []
        coords = []
        for i in range(len(indeces)):
            for j in range(i + 1, len(indeces)):
                pairs.append((reads[indeces[i]].seq, reads[indeces[j]].seq))
                coords.append((i, j))
        if not pairs:
            return
        dists = self.engine.distances(pairs)
        for (i, j), d, (x, y) in zip(coords, dists, pairs):
            largest = float(max(len(x), len(y)))
            distmatrix.set_dist(i, j, d / largest)

    # -- reassignment fallback ----------------------------------------------

    def pair_dist_fn(self, reads: List[AnRead]):
        """Per-pair host fallback used by invalid_reassignment (mixed
        ends-free cases); the batched matrix path goes via fill_matrix."""
        return lambda a, b: get_dist_anreads(True, a, b)
