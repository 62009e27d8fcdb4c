from . import poisson
