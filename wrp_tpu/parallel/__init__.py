from .mesh import make_mesh, DATA_AXIS, SEQ_AXIS  # noqa: F401
from .sharded import build_sharded_processor, shard_batch  # noqa: F401
