from lmc_atomi_tpu.utils.cli import auto_cli
from lmc_atomi_tpu.utils.images import phantom

__all__ = ["auto_cli", "phantom"]
