"""2-process ``jax.distributed`` CPU dryrun of the multi-host data path
(round-3 VERDICT next #6).

Each process hosts 4 virtual CPU devices (8 global), initializes
``jax.distributed`` against a local coordinator, builds the standard
``make_mesh()`` over ALL 8 devices, feeds ONLY its process-local 4 rows of
the global batch through ``shard_batch_local``
(``jax.make_array_from_process_local_data``), and runs a
``data_parallel_step`` whose loss/grads are globally reduced by the
in-loss ``pmean`` — the exact trainer idiom (bfmnet_trainer._step).  The
step's gradient is checked against the analytic full-batch value, so a
dropped cross-process psum (grads off by 2x) fails loudly.

Run:  python -m experiments.dryrun_multihost
Exits 0 and prints ``MULTIHOST DRYRUN OK`` if both processes agree with
the analytic gradient; the PARITY.md multi-host note records the outcome.
"""
import os
import subprocess
import sys

PORT = 18273
N_PROC = 2
LOCAL_DEV = 4


def child(pid: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                               num_processes=N_PROC, process_id=pid)
    import numpy as np

    from voicepuppet_tpu.parallel.mesh import (data_parallel_step,
                                               local_batch_rows, make_mesh,
                                               shard_batch_local)

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEV, jax.devices()
    assert len(jax.local_devices()) == LOCAL_DEV

    mesh = make_mesh()  # 8-way data axis spanning both processes
    global_batch = 8
    rows = local_batch_rows(global_batch, mesh)
    assert rows == 4, rows

    # both processes draw the SAME global batch, then keep their slice —
    # stand-in for a sharded input pipeline
    rng = np.random.RandomState(0)
    x = rng.randn(global_batch, 16).astype(np.float32)
    y = rng.randn(global_batch, 1).astype(np.float32)
    w0 = np.zeros((16, 1), np.float32)
    lo = pid * rows
    local = (x[lo:lo + rows], y[lo:lo + rows])

    def step(w, batch, rng_):
        bx, by = batch

        def loss_of(wp):
            err = bx @ wp - by
            # global loss = pmean of shard losses; AD inserts the grad psum
            return jax.lax.pmean((err * err).mean(), axis_name="data")

        loss, g = jax.value_and_grad(loss_of)(w)
        return w - 0.1 * g, loss

    fn = data_parallel_step(step, mesh, donate_state=False)
    batch = shard_batch_local(local, mesh)
    w1, loss = fn(w0, batch, jax.random.PRNGKey(0))

    # analytic full-batch gradient: dL/dw = 2/B * X^T (Xw - y), w0 = 0
    g_ref = 2.0 / global_batch * x.T @ (x @ w0 - y)
    np.testing.assert_allclose(np.asarray(jax.device_get(w1)),
                               w0 - 0.1 * g_ref, rtol=1e-5, atol=1e-6)
    print(f"proc {pid}: loss={float(loss):.6f} grad OK", flush=True)


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
    procs = [
        subprocess.Popen([sys.executable, __file__, str(pid)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(N_PROC)
    ]
    ok = True
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        text = out.decode()
        sys.stdout.write(f"--- proc {pid} (rc={p.returncode}) ---\n{text}")
        ok &= p.returncode == 0 and f"proc {pid}: loss=" in text
    print("MULTIHOST DRYRUN OK" if ok else "MULTIHOST DRYRUN FAILED",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1:
        child(int(sys.argv[1]))
    else:
        sys.exit(main())
