from .mesh import make_render_mesh, render_sharded  # noqa: F401
