from . import watchdog  # noqa: F401
