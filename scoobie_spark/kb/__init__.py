from .model import KB  # noqa: F401
