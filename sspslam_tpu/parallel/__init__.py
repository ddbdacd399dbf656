from .sharding import make_mesh, replicated, shard_state, state_shardings

__all__ = ["make_mesh", "replicated", "shard_state", "state_shardings"]
