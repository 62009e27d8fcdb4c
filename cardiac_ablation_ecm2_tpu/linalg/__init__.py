from .solvers import cg, cg_merged, gmres, power_method, default_dot, SolveInfo
from .smoothers import jacobi, chebyshev
from . import ode
from .newton import newton, NewtonInfo
from .multigrid import Multigrid, MGLevel, make_p_multigrid, make_h_multigrid
from .krylov_extra import minres, bicgstab
from .lobpcg import lobpcg, EigResult
from . import ode2
