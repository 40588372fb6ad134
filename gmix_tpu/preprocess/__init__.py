from . import dictionary  # noqa: F401
