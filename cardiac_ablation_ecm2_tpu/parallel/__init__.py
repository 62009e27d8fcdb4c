from . import bioheat, ops, partition, pfespace, poisson
