from . import checkpoint, colormap, debug_dump, probes, timing, video  # noqa: F401
