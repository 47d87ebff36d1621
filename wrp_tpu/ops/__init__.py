from . import dft  # noqa: F401
