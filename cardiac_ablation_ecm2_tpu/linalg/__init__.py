from .solvers import cg, gmres, power_method, default_dot, SolveInfo
from .smoothers import jacobi, chebyshev
from . import ode
