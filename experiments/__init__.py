"""TPU profiling harnesses (run manually on the real chip; not shipped).

The measurement methodology lives in exactly one place —
``experiments/_timing.py`` — and every profile_* script imports it.
"""
