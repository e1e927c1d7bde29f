from xgan.parallel.mesh import MeshContext, create_mesh

__all__ = ["MeshContext", "create_mesh"]
