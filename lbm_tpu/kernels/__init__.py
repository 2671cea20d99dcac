from . import collide_pallas  # noqa: F401
