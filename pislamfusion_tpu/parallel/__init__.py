from .mesh import make_mesh, default_mesh_shape
from . import dist_ba, batch
