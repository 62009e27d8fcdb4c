from . import ablation, bioheat, heat, poisson, rf_laplace
