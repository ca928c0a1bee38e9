from lmc_atomi_tpu.core.random import as_key, chain_keys, normal_like, step_key
from lmc_atomi_tpu.core.state import SamplerState, StepInfo
from lmc_atomi_tpu.core.stats import RunningMoments, RunningQuantile

__all__ = [
    "as_key",
    "chain_keys",
    "normal_like",
    "step_key",
    "SamplerState",
    "StepInfo",
    "RunningMoments",
    "RunningQuantile",
]
