"""otter-tpu: a TPU-native targeted local assembler and genotyper for long reads.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ tool ``otter`` (holstegelab/otter): given a BED file of regions of interest
and aligned long reads (BAM), it extracts spanning read subsequences per
region, computes all-vs-all pairwise edit distances with batched banded DP
kernels on TPU, adapts the clustering threshold to the local error rate with a
Gaussian KDE, hierarchically clusters reads into allele groups, builds a
consensus per allele with a backbone-anchored partial-order-alignment graph,
and jointly genotypes alleles across samples into a multi-sample VCF.

Subcommand surface parity (reference src/main.cpp:19-29):
  assemble, genotype, wgat, vcf2mat, compare, version

Layering:
  io/       host-side feeders and writers (BGZF/BAM/BAI/FASTA/BED/VCF)
  seqs/     read/allele data model + CIGAR breakpoint projection
  ops/      exact host reference algorithms (alignment, KDE, hclust, POA)
  kernels/  Pallas TPU kernels (batched banded edit/affine DP, KDE grid)
  models/   the workload pipelines (assemble/genotype/wgat/compare/vcf2mat)
  parallel/ device mesh + sharded region-batch execution
  cli/      command-line interface with reference-identical flags/defaults
"""

OTTER_VERSION = "v1.0"  # parity with reference src/main.cpp:9

__version__ = "0.1.0"
