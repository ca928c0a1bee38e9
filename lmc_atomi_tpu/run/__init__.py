from lmc_atomi_tpu.run.longrun import run_resumable, run_resumable_fused
from lmc_atomi_tpu.run.runner import (
    ChainResult,
    run_chain,
    run_chain_segmented,
    run_chains,
)

__all__ = [
    "ChainResult",
    "run_chain",
    "run_chain_segmented",
    "run_chains",
    "run_resumable",
    "run_resumable_fused",
]
