from . import files, codec, frames  # noqa: F401
