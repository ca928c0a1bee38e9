from lmc_atomi_tpu.run.runner import ChainResult, run_chain, run_chains

__all__ = ["ChainResult", "run_chain", "run_chains"]
