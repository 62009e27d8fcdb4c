from .geometry import Geometry
from .fespace import FESpace, L2FESpace, element_node_coords
from .restriction import ElementRestriction
from .build import restriction_for, geom_factors_for, basis_for, bdr_restriction_for
from . import basis, coefficient, geom_factors, gridfunction, intrules, quadinterp
from . import transfer
from . import estimators, faces
from .fe_vector_simplex import (
    NDSimplexSpace,
    RTSimplexSpace,
    project_vec_simplex,
)
