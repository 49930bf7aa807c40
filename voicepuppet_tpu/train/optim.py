"""Optimizer construction matching the reference trainers.

BFMNet (bfmnet.py:307-318): Adam on an exponential-decay (staircase)
schedule with clip-by-global-norm 50 applied to the gradients *before* the
Adam update — optax order: clip then scale_by_adam.

PixRefer/PixFlow (pixrefer.py:396-407): two Adams with beta1=0.5 on a
shared exponential-decay schedule, no clipping.
"""

from __future__ import annotations

import optax


def exponential_decay_schedule(learning_rate: float, decay_steps: int,
                               decay_rate: float) -> optax.Schedule:
    """tf.train.exponential_decay(staircase=True)
    (ref: bfmnet.py:308-309)."""
    if decay_rate == 1.0:
        return optax.constant_schedule(learning_rate)
    return optax.exponential_decay(init_value=learning_rate,
                                   transition_steps=decay_steps,
                                   decay_rate=decay_rate, staircase=True)


def reference_adam(learning_rate: float, decay_steps: int = 1000,
                   decay_rate: float = 1.0, beta1: float = 0.9,
                   max_grad_norm: float = 0.0
                   ) -> optax.GradientTransformation:
    sched = exponential_decay_schedule(learning_rate, decay_steps,
                                       decay_rate)
    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.adam(sched, b1=beta1))
    return optax.chain(*chain)


def bfmnet_optimizer(training_cfg) -> optax.GradientTransformation:
    """ref: bfmnet.py:307-318, defaults from bfmnet.py:153-155."""
    return reference_adam(training_cfg.learning_rate,
                          training_cfg.decay_steps,
                          training_cfg.decay_rate,
                          beta1=training_cfg.beta1,
                          max_grad_norm=training_cfg.max_grad_norm)


def gan_optimizer(training_cfg) -> optax.GradientTransformation:
    """ref: pixrefer.py:396-407 (Adam, beta1 .5, exp decay, no clip).

    The reference's D and G optimizers share one global_step, and BOTH
    apply_gradients increment it — so global_step advances 2 per training
    iteration while each optax optimizer here counts 1 per iteration.
    Halving transition_steps reproduces the reference schedule *exactly*
    under staircase: D sees floor(2N/1000) == floor(N/500), and G sees
    floor((2N+1)/1000) == floor(N/500) too (an odd 2N+1 never lands on an
    even multiple of 1000)."""
    return reference_adam(training_cfg.learning_rate,
                          max(1, training_cfg.decay_steps // 2),
                          training_cfg.decay_rate,
                          beta1=training_cfg.beta1,
                          max_grad_norm=0.0)
