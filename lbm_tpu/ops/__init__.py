from . import collide, equilibrium, macros, poisson, stream  # noqa: F401
