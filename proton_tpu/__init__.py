"""proton_tpu — a TPU-native framework for fast prototyping of numerical
methods for PDEs, with the capabilities of the reference library ProtoN
(HHO and cutHHO discretizations of 2D elliptic problems on quad/polygonal
meshes, fictitious-domain and interface problems via level-set cuts, and an
HHO obstacle solver).

Architecture: mesh-as-tensors, methods-as-batched-kernels, solve-as-lax-loop.
See SURVEY.md for the layer-by-layer mapping to the reference.
"""

from . import config  # applies x64 setting; must be first
from .core.mesh import (Mesh, MeshInitParams, make_quad_mesh, make_poly_mesh,
                        load_poly_mesh, BND_DIRICHLET, BND_NEUMANN, BND_NONE,
                        BND_ROBIN)
from .core.geometry import cell_geometry, CellGeom
from .core.ops import HHODegreeInfo
from .methods import hho, assembly
from .solvers import cg

__version__ = "0.1.0"
