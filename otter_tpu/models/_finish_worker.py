"""Worker-process entry for the host-side finish phase of assemble.

The reference parallelizes whole regions over threads (BS_thread_pool,
assemble.cpp:43). Here the device-owning parent process batches all distance
work, and the remaining host math (hclust + KDE decision + reassignment +
consensus) fans out over worker processes via this module — which is
deliberately jax-free so spawned workers never touch the accelerator.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import OtterOpts
from ..ops.cluster import ClusteringStatus, otter_hclust
from ..ops.consensus import (
    consensus_apply_batched,
    consensus_prepare,
    invalid_reassignment,
    reassignment_distances_batched,
)
from ..ops.distmat import DistMatrix
from ..seqs.model import AnAllele


def finish_region_worker(args) -> Tuple[ClusteringStatus, List[AnAllele]]:
    """(params, work, condensed_values) -> (clustmsg, alleles)."""
    params, work, values = args
    distmatrix = DistMatrix(len(work.valid_indeces))
    if values is not None:
        distmatrix.values = np.asarray(values, dtype=np.float64)
    clustmsg = ClusteringStatus()
    otter_hclust(work.ignore_haps, params.max_alleles, params.bandwidth_short,
                 params.bandwidth_length, params.bandwidth_long,
                 params.max_error, params.min_cov_fraction,
                 params.min_cov_fraction2_l, params.min_cov_fraction2_f,
                 work.valid_indeces, distmatrix, work.reads, clustmsg)
    labels = [-1] * len(work.reads)
    for i in range(len(clustmsg.labels)):
        labels[work.valid_indeces[i]] = clustmsg.labels[i]
    if work.invalid_indeces:
        pre = reassignment_distances_batched(work.reads, labels, engine=None)
        invalid_reassignment(work.ignore_haps, params.min_sim,
                             params.max_error, clustmsg.fc, work.reads,
                             labels, precomputed=pre)
    alleles = [AnAllele() for _ in range(clustmsg.fc)]
    tasks = consensus_prepare(work.ignore_haps, work.reads, labels,
                              work.valid_indeces, clustmsg.fc, distmatrix,
                              alleles)
    consensus_apply_batched(tasks)
    return clustmsg, alleles
