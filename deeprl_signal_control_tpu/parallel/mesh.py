"""Device-mesh scale-out.

The reference is a single-process CPU program whose only parallel axis was
disabled threading (/root/reference/main.py:123-145). The TPU-native scaling
design (SURVEY.md section 2 parallelism table):

* **Environment data parallelism** — the headline axis. Env instances are
  sharded over the ``env`` mesh axis; every chip steps its shard of the
  batched microsim locally (zero cross-chip traffic in the sim itself).
* **Learner replication** — agent-stacked parameters are replicated; the
  loss averages over the sharded [T, B, ...] batch, so XLA GSPMD inserts the
  gradient all-reduce (psum over ICI) automatically from the sharding
  annotations. Networks are tiny (64-unit LSTM), so pure DP is the right
  sharding: there is nothing to gain from TP/PP within a 100k-param model.
* Multi-host: the same annotations extend over a multi-host mesh via
  ``jax.distributed`` initialization; env shards never cross hosts, and the
  only DCN traffic is the (tiny) gradient all-reduce.

Inputs placed with these shardings make plain ``jax.jit`` compile the
sharded program — no pmap/shard_map plumbing needed in the trainer.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis: str = "env") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _put(x, sh: NamedSharding):
    """Place host data under ``sh``; on a multi-process mesh, assemble the
    global jax.Array from each process's addressable shards (device_put
    rejects shardings with non-addressable devices)."""
    if sh.is_fully_addressable:
        return jax.device_put(x, sh)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


def shard_env_batch(tree, mesh: Mesh, axis: str = "env"):
    """Place a pytree whose leaves lead with the env-batch axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: _put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: _put(x, sh), tree)
