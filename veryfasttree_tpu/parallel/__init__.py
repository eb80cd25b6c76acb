from .mesh import make_mesh

__all__ = ["make_mesh"]
