"""Workload pipelines (the reference's L4 layer, src/{assemble,genotype,wgat,
compare,vcf2mat}.cpp) rebuilt around batched TPU execution."""

from .assemble import assemble
from .genotype import genotype
from .wgat import wgat
from .compare import compare
from .vcf2mat import vcf2mat
