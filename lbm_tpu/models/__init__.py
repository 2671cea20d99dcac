from . import cavity, plasma  # noqa: F401
