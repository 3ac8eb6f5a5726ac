from . import lie, cameras, robust, triangulate  # noqa: F401
