"""The driver contract for bench.py: ONE JSON line with the metric,
value, unit, and vs_baseline keys (plus the provenance fields the round-2
ADVICE asked for).  Importing bench must be cheap and backend-free (jax
only loads inside main), so this pins the emit format without touching
the TPU."""

import json


def test_emit_json_contract(capsys):
    import bench

    bench._best["runs"] = 7
    bench._best["compute_fps"] = 245.3
    bench._emit(80.25)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    rec = json.loads(out[0])
    assert rec["metric"] == "e2e_synthesis_frames_per_sec_per_chip_512px"
    assert rec["value"] == 80.25
    assert rec["unit"] == "frames/s"
    # vs_baseline = value / (625/8 per-chip share)
    assert abs(rec["vs_baseline"] - 80.25 / 78.125) < 1e-3
    assert rec["runs"] == 7
    assert rec["watchdog"] is False
    assert rec["compute_fps"] == 245.3


def test_emit_handles_unmeasured_compute(capsys):
    import bench

    bench._best["runs"] = 1
    bench._best["compute_fps"] = None
    bench._emit(25.0, watchdog=True)
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["watchdog"] is True
    assert rec["compute_fps"] is None
