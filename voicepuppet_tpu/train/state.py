"""Train state containers (flax pytrees).

The reference keeps training state implicit in the TF1 graph (global_step
variable, optimizer slots, batch-norm moving stats; e.g. bfmnet.py:307,
train_bfmnet.py:94-96).  Here it is one explicit pytree per model —
checkpointable with orbax, shardable with jax.sharding.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax
import jax
import optax


@flax.struct.dataclass
class TrainState:
    """Single-optimizer model state (BFMNet / ATNet)."""
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   tx=tx)

    def apply_gradients(self, grads, batch_stats=None):
        updates, opt_state = self.tx.update(grads, self.opt_state,
                                            self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            opt_state=opt_state,
                            batch_stats=(self.batch_stats
                                         if batch_stats is None
                                         else batch_stats))


@flax.struct.dataclass
class GANTrainState:
    """Two-optimizer GAN state (PixReferNet / PixFlowNet / VGNet).

    The reference steps D then G each iteration from the same forward pass,
    with global_step incremented by both optimizers
    (pixrefer.py:396-407) — mirrored by ``step`` advancing by 2.
    """
    step: jax.Array
    g_params: Any
    d_params: Any
    batch_stats: Any
    g_opt_state: Any
    d_opt_state: Any
    g_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_params, d_params, batch_stats, g_tx, d_tx):
        import jax.numpy as jnp
        return cls(step=jnp.zeros((), jnp.int32), g_params=g_params,
                   d_params=d_params, batch_stats=batch_stats,
                   g_opt_state=g_tx.init(g_params),
                   d_opt_state=d_tx.init(d_params), g_tx=g_tx, d_tx=d_tx)
    # NOTE: updates are applied inside each GAN trainer's step (D first,
    # then G against the UPDATED D) — a combined apply-gradients helper
    # here would get the ordering wrong.
