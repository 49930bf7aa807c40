"""Real-chip test tier.

Unlike tests/ (which forces the virtual 8-device CPU mesh), this tier
runs on whatever JAX_PLATFORMS points at — the axon TPU tunnel in this
environment.  Tests skip themselves when the backend is not TPU, so
`python -m pytest tests_tpu/ -q` is safe to run anywhere.

Never run concurrently with bench.py or other TPU work (CLAUDE.md:
silent tunnel contention skews both).
"""
