# Train the SN-DnCNN prior once and checkpoint it for the block runs.
import jax, jax.numpy as jnp
import numpy as np
from lmc_atomi_tpu.models.dncnn import train_denoiser, conv_operator_norms, lipschitz_estimate, make_denoiser
from lmc_atomi_tpu.core.checkpoint import save_checkpoint
from lmc_atomi_tpu.utils.images import phantom

key = jax.random.PRNGKey(0)
kd = jax.random.split(key, 3)[0]
params, _ = train_denoiser(kd, noise_sigma=0.05, steps=1500, depth=8, features=48, spectral_norm=1.1)
save_checkpoint("/tmp/pnp_params.msgpack", params)
norms = conv_operator_norms(params)
print("lip bound:", float(np.prod(list(norms.values()))))
