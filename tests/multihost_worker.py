"""Worker process for the 2-process jax.distributed chain-farm test.

Usage: python multihost_worker.py PORT PROC_ID NUM_PROCS OUT_JSON

Each process exposes 2 virtual CPU devices; the global mesh spans 4 devices
across the two processes — the DCN-tier code path of
``parallel/multihost.py`` (coordinator handshake, cross-process shard_map,
allgathered moment merge)."""
import json
import os
import sys

port, proc_id, num_procs, out_path = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lmc_atomi_tpu.parallel.multihost import (  # noqa: E402
    global_chain_farm,
    init_multihost,
)

n = init_multihost(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)
assert n == num_procs
assert jax.process_count() == num_procs
assert len(jax.devices()) == 2 * num_procs, jax.devices()

from lmc_atomi_tpu.kernels import ula  # noqa: E402
from lmc_atomi_tpu.models import GaussianMixture  # noqa: E402

MUS = np.array([[0.0, 0.0], [-2.0, 3.0]])
SIGMAS = np.array([[[1.0, -0.5], [-0.5, 1.0]], [[0.5, 0.2], [0.2, 0.7]]])
gm = GaussianMixture.create(MUS, SIGMAS, np.ones(2) / 2)
kern = ula(gm.grad_potential, 0.05)

key = jax.random.PRNGKey(0)
x0 = jnp.zeros(2)
res, pooled = global_chain_farm(
    kern, x0, key, 100, n_chains=8, collect="stats"
)

if proc_id == 0:
    out = {
        "count": int(pooled.count),
        "mean": np.asarray(pooled.mean).tolist(),
        "variance": np.asarray(pooled.variance).tolist(),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
print(f"worker {proc_id} done", file=sys.stderr)
