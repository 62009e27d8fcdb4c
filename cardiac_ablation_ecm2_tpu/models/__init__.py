from . import (ablation, advection_diffusion, bioheat, darcy, elasticity,
               heat, hyperelastic, poisson, rf_laplace, wave)
