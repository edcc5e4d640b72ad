from .mesh import (CHAIN_AXIS, chain_mesh, chain_sharding, distributed_init,
                   local_chain_slice, pad_chains, replicated,
                   shard_chain_batch, sharded_jit)

__all__ = ["CHAIN_AXIS", "chain_mesh", "chain_sharding", "distributed_init",
           "local_chain_slice", "replicated", "pad_chains",
           "shard_chain_batch", "sharded_jit"]
