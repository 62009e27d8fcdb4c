from . import (ablation, bioheat, darcy, elasticity, heat, hyperelastic,
               poisson, rf_laplace, wave)
