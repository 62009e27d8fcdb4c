from .mesh_io import read_mfem_mesh, write_mfem_mesh
from .vtu import write_vtu, vertex_values, write_pvd
from .checkpoint import (DataCollection, save_gridfunction,
                         load_gridfunction, save_visit, load_visit)
from .gf_io import write_gridfunction, read_gridfunction
from .gmsh import read_gmsh
from .vtkhdf import VTKHDFDataCollection, read_vtkhdf
from .orbax_ckpt import ShardedCheckpointer
