from .backend import MeshBABackend, default_mesh_backend  # noqa: F401
from .dist_ba import distributed_ba, make_distributed_ba, shard_problem  # noqa: F401
from .dist_database import DistKeyFrameDatabase  # noqa: F401
from .dist_pose_graph import (  # noqa: F401
    distributed_pose_graph,
    make_distributed_pose_graph,
)
