from .core import composite_key, iso_now, safe_div  # noqa: F401
