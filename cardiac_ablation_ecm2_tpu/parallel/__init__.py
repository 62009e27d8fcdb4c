from . import ops, partition, pfespace, poisson
