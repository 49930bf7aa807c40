"""Shared TPU micro-timing harness for the experiments/profile_* scripts.

This is THE canonical implementation of the measurement methodology
CLAUDE.md pins (hard-won through the axon tunnel, docs/PERF.md
"Environment ceilings"):

  * any single-call timing under ~100 ms is mostly the ~27 ms
    dispatch+fetch round-trip, not compute — so repeat the op K times
    INSIDE one jit via ``lax.fori_loop`` with a carried data dependence
    (XLA cannot hoist it), and report ``(t_K - t_1) / (K - 1)``;
  * ``block_until_ready`` can return early through the tunnel — every
    timing must end in a VALUE FETCH;
  * run-to-run walls swing 2-5x with tunnel weather — compare variants
    interleaved A/B/A/B in the SAME process and take per-variant minima.

Scripts build their jitted pairs with :func:`repeat_jit` /
:func:`build_progs`, time them with :func:`interleaved_minima`, and
report :func:`per_iter`.  Keeping this logic in one module means a
methodology fix lands everywhere at once instead of drifting across
copy-pasted harnesses.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fetch(v) -> float:
    """Value fetch — the only trustworthy synchronization point through
    the tunnel (``block_until_ready`` can return early)."""
    return float(np.asarray(v).ravel()[0])


def repeat_jit(f: Callable, k: int) -> Callable:
    """``jit(x -> scalar)`` running ``f`` ``k`` times inside one jit.

    The carry perturbs every floating leaf of ``x`` by ``1e-30 * s``
    where ``s`` sums ALL of ``f``'s output leaves — so no iteration and
    no output can be hoisted or dead-code-eliminated."""
    @jax.jit
    def run(x):
        def body(_, carry):
            x_i, acc = carry
            out = f(x_i)
            s = jnp.float32(0.0)
            for leaf in jax.tree_util.tree_leaves(out):
                s = s + jnp.sum(leaf).astype(jnp.float32)

            def nudge(a):
                if jnp.issubdtype(jnp.result_type(a), jnp.floating):
                    return a + (1e-30 * s).astype(jnp.result_type(a))
                return a

            return (jax.tree_util.tree_map(nudge, x_i), acc + s)

        _, acc = jax.lax.fori_loop(0, k, body, (x, jnp.float32(0.0)))
        return acc
    return run


def build_progs(cases: Mapping[str, Tuple[Callable, Any]], k: int,
                log: Optional[Callable] = print
                ) -> Dict[str, Tuple[Callable, Callable, Any]]:
    """``{name: (f, x)}`` -> compiled ``{name: (run1, runK, x)}``.

    Compiles AND executes both programs once (warmup); a variant that
    fails to compile is reported and skipped rather than killing the
    whole A/B."""
    progs = {}
    for name, (f, x) in cases.items():
        try:
            p1, pk = repeat_jit(f, 1), repeat_jit(f, k)
            fetch(p1(x))
            fetch(pk(x))
            progs[name] = (p1, pk, x)
            if log:
                log(f"compiled {name}")
        except Exception as e:  # noqa: BLE001 — report-and-continue A/B
            if log:
                log(f"FAILED {name}: {type(e).__name__}: {str(e)[:200]}")
    return progs


def interleaved_minima(progs: Mapping[str, Tuple[Callable, Callable, Any]],
                       rounds: int = 6, log: Optional[Callable] = print
                       ) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Interleaved A/B/A/B walls, per-variant minima over ``rounds``."""
    mins1 = {name: float("inf") for name in progs}
    minsk = {name: float("inf") for name in progs}
    for r in range(rounds):
        for name, (f1, fk, x) in progs.items():
            t0 = time.perf_counter()
            fetch(f1(x))
            mins1[name] = min(mins1[name], time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetch(fk(x))
            minsk[name] = min(minsk[name], time.perf_counter() - t0)
        if log:
            log(f"round {r} done")
    return mins1, minsk


def per_iter(mins1: Mapping[str, float], minsk: Mapping[str, float],
             k: int) -> Dict[str, float]:
    """Amortized seconds per iteration: ``(t_K - t_1) / (K - 1)``."""
    assert k > 1
    return {name: (minsk[name] - mins1[name]) / (k - 1) for name in mins1}
