from .mesh import (
    Mesh,
    curve_mesh,
    make_cartesian_2d,
    make_periodic_cartesian_2d,
    make_cartesian_2d_tri,
    make_cartesian_3d,
    make_cartesian_3d_prism,
    make_cartesian_3d_pyramid,
    make_cartesian_3d_tet,
    unique_edges,
    unique_faces,
)
from . import amr, point_eval
from . import submesh
