from . import ablation, bioheat, darcy, elasticity, heat, poisson, rf_laplace, wave
