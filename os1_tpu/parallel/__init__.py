from .dist_ba import distributed_ba, shard_problem  # noqa: F401
