from .mesh import make_mesh, default_mesh_shape
from . import dist_ba, batch


def __getattr__(name):   # lazy: dist_mosaic/dist_ransac pull heavy deps
    if name in ("dist_mosaic", "dist_ransac", "dist_vo"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
