from .mesh import MeshBackend, SimBackend, party_mesh  # noqa: F401
