from .sharding import make_mesh, replicated, shard_state, state_shardings
from .shard_step import make_sharded_vco_scan, pad_vco_params
from .trials import run_batched_episodes, run_seed_sweep

__all__ = ["make_mesh", "replicated", "shard_state", "state_shardings",
           "run_batched_episodes", "run_seed_sweep", "make_sharded_vco_scan",
           "pad_vco_params"]
