from . import coder, murmur, sigmoid, tables  # noqa: F401
