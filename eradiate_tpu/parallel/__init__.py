from .mesh import (  # noqa: F401
    make_render_mesh,
    render_sharded,
    render_spherical_sharded,
)
