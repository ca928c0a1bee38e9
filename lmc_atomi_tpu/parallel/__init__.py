from lmc_atomi_tpu.parallel.mesh import (
    chain_mesh,
    image_mesh,
    merge_chain_moments,
    run_chains_sharded,
    shard_image,
)
from lmc_atomi_tpu.parallel.multihost import global_chain_farm, init_multihost

__all__ = [
    "chain_mesh",
    "image_mesh",
    "merge_chain_moments",
    "run_chains_sharded",
    "shard_image",
    "global_chain_farm",
    "init_multihost",
]
