from . import catalog, io  # noqa: F401
