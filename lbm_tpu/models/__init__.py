from . import cavity, plasma, plasma3d  # noqa: F401
