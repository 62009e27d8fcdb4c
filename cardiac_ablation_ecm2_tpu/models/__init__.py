from . import ablation, bioheat, elasticity, heat, poisson, rf_laplace
