from .sharding import make_mesh, replicated, shard_state, state_shardings
from .trials import run_batched_episodes

__all__ = ["make_mesh", "replicated", "shard_state", "state_shardings",
           "run_batched_episodes"]
