from .bilinearform import BilinearForm, PAOperator, register_integrator
from .operators import (
    ConstrainedOperator,
    LinearOperator,
    form_linear_system,
    identity,
)
from . import convection, diffusion, elasticity, linearform, mass
from . import block, dg_advection, vecfe
from . import hyperbolic
from . import dg_diffusion
from . import hybridization
from . import complex_fem
from .complex_fem import (ComplexGridFunction, ComplexOperator,
                          SesquilinearForm, complex_jacobi,
                          form_complex_linear_system)
