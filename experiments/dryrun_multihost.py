"""2-process ``jax.distributed`` CPU dryrun of the multi-host data path
(round-3 VERDICT next #6) and the multi-host checkpoint roundtrip
(round-4 VERDICT next #6).

Each process hosts 4 virtual CPU devices (8 global), initializes
``jax.distributed`` against a local coordinator, builds the standard
``make_mesh()`` over ALL 8 devices, feeds ONLY its process-local 4 rows of
the global batch through ``shard_batch_local``
(``jax.make_array_from_process_local_data``), and runs
``data_parallel_step``s whose loss/grads are globally reduced by the
in-loss ``pmean`` — the exact trainer idiom (bfmnet_trainer._step).  The
first step's gradient is checked against the analytic full-batch value,
so a dropped cross-process psum (grads off by 2x) fails loudly.

Phase 2 (checkpoint roundtrip): the save group trains K steps and saves
through ``train.checkpoint.CheckpointManager`` (orbax) FROM BOTH
PROCESSES; then a FRESH process group (new coordinator, restarted
runtime) restores into a zeroed state and asserts the restored weights
equal the analytic single-process full-batch K-step trajectory — i.e.
restart-restore preserves DP ≡ single-device semantics across hosts.

Run:  python -m experiments.dryrun_multihost
Exits 0 and prints ``MULTIHOST DRYRUN OK`` plus
``MULTIHOST CKPT ROUNDTRIP OK`` if all checks pass; the PARITY.md
multi-host note records the outcome.
"""
import os
import subprocess
import sys
import tempfile

PORT = 18273
N_PROC = 2
LOCAL_DEV = 4
TRAIN_STEPS = 3
LR = 0.1


def _analytic_weights(x, y, steps):
    """Single-process full-batch GD trajectory (the semantics DP must
    preserve)."""
    import numpy as np
    w = np.zeros((16, 1), np.float32)
    for _ in range(steps):
        g = 2.0 / x.shape[0] * x.T @ (x @ w - y)
        w = w - LR * g
    return w


def _data():
    import numpy as np
    rng = np.random.RandomState(0)
    x = rng.randn(8, 16).astype(np.float32)
    y = rng.randn(8, 1).astype(np.float32)
    return x, y


def _setup(pid: int, port: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=N_PROC, process_id=pid)
    from voicepuppet_tpu.parallel.mesh import (data_parallel_step,
                                               local_batch_rows, make_mesh,
                                               shard_batch_local)

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEV, jax.devices()
    assert len(jax.local_devices()) == LOCAL_DEV

    mesh = make_mesh()  # 8-way data axis spanning both processes
    x, y = _data()
    rows = local_batch_rows(x.shape[0], mesh)
    assert rows == 4, rows
    lo = pid * rows
    local = (x[lo:lo + rows], y[lo:lo + rows])

    def step(w, batch, rng_):
        bx, by = batch

        def loss_of(wp):
            err = bx @ wp - by
            # global loss = pmean of shard losses; AD inserts the grad psum
            return jax.lax.pmean((err * err).mean(), axis_name="data")

        loss, g = jax.value_and_grad(loss_of)(w)
        return w - LR * g, loss

    fn = data_parallel_step(step, mesh, donate_state=False)
    batch = shard_batch_local(local, mesh)
    return jax, fn, batch, x, y


def child_save(pid: int, ckpt_dir: str) -> None:
    import numpy as np

    jax, fn, batch, x, y = _setup(pid, PORT)
    import jax.random as jrandom

    w = np.zeros((16, 1), np.float32)
    for k in range(TRAIN_STEPS):
        w, loss = fn(w, batch, jrandom.PRNGKey(k))
        if k == 0:
            # analytic full-batch first step: dL/dw = 2/B X^T (Xw0 - y)
            g_ref = 2.0 / x.shape[0] * x.T @ (x @ np.zeros((16, 1)) - y)
            np.testing.assert_allclose(np.asarray(jax.device_get(w)),
                                       -LR * g_ref, rtol=1e-5, atol=1e-6)
            print(f"proc {pid}: loss={float(loss):.6f} grad OK", flush=True)

    # multi-host orbax save: every process participates in the same save
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(ckpt_dir, save_interval=1)
    mgr.save(TRAIN_STEPS, {"w": w, "step": TRAIN_STEPS})
    print(f"proc {pid}: saved step {TRAIN_STEPS}", flush=True)


def child_restore(pid: int, ckpt_dir: str) -> None:
    import numpy as np

    jax, fn, batch, x, y = _setup(pid, PORT + 1)
    from voicepuppet_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(ckpt_dir, save_interval=1)
    assert mgr.latest_step() == TRAIN_STEPS, mgr.latest_step()
    zero = {"w": np.zeros((16, 1), np.float32), "step": 0}
    state = mgr.restore(zero)
    assert int(state["step"]) == TRAIN_STEPS
    want = _analytic_weights(x, y, TRAIN_STEPS)
    np.testing.assert_allclose(np.asarray(state["w"]), want,
                               rtol=1e-5, atol=1e-6)
    # the restored state must be immediately trainable: one more DP step
    # equals the analytic step-4 trajectory
    import jax.random as jrandom
    w4, _ = fn(np.asarray(state["w"]), batch, jrandom.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(jax.device_get(w4)),
                               _analytic_weights(x, y, TRAIN_STEPS + 1),
                               rtol=1e-5, atol=1e-6)
    print(f"proc {pid}: restore OK (step {TRAIN_STEPS}, params == "
          "single-process trajectory)", flush=True)


def _run_group(phase: str, ckpt_dir: str, env) -> bool:
    procs = [
        subprocess.Popen([sys.executable, __file__, str(pid), phase,
                          ckpt_dir], env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT)
        for pid in range(N_PROC)
    ]
    ok = True
    marker = {"save": "saved step", "restore": "restore OK"}[phase]
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode()
        sys.stdout.write(f"--- {phase} proc {pid} (rc={p.returncode}) ---\n"
                         f"{text}")
        ok &= p.returncode == 0 and marker in text
    return ok


def main() -> int:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # APPEND to PYTHONPATH (never overwrite: the axon plugin lives there)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p])
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={LOCAL_DEV}"
        ).strip()
    with tempfile.TemporaryDirectory() as ckpt_dir:
        ok = _run_group("save", ckpt_dir, env)
        print("MULTIHOST DRYRUN OK" if ok else "MULTIHOST DRYRUN FAILED",
              flush=True)
        ok2 = ok and _run_group("restore", ckpt_dir, env)
        print("MULTIHOST CKPT ROUNDTRIP OK" if ok2
              else "MULTIHOST CKPT ROUNDTRIP FAILED", flush=True)
    return 0 if (ok and ok2) else 1


if __name__ == "__main__":
    if len(sys.argv) > 1:
        pid, phase, ckpt_dir = (int(sys.argv[1]), sys.argv[2], sys.argv[3])
        child_save(pid, ckpt_dir) if phase == "save" else \
            child_restore(pid, ckpt_dir)
    else:
        sys.exit(main())
