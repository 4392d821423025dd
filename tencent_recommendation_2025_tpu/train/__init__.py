from . import checkpoint, telemetry, trainer  # noqa: F401
