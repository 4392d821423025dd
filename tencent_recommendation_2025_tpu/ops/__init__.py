from . import losses, hstu_attention  # noqa: F401
