"""wait_for_device: the bench-boundary failure detector (SURVEY.md §6.3).

The axon PJRT tunnel is observed to go down between sessions in two modes:
fast UNAVAILABLE errors and silent wedges where ``jax.devices()`` blocks
>10 min. bench.py probes in a subprocess with a hard timeout so a
round-end bench rides out a transient outage instead of hanging/dying.
"""

import json
import os
import time

import pytest

from bin_tpu.benchmark import wait_for_device


def _with_platform(value):
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = value
    return old


def _restore_platform(old):
    if old is None:
        os.environ.pop("JAX_PLATFORMS", None)
    else:
        os.environ["JAX_PLATFORMS"] = old


def test_wait_for_device_success():
    # the probe subprocess applies JAX_PLATFORMS in-process (the site hook
    # ignores the env var — SURVEY.md §5), so cpu makes it succeed fast
    old = _with_platform("cpu")
    try:
        t0 = time.monotonic()
        assert wait_for_device(deadline_s=300.0) is True
        assert time.monotonic() - t0 < 300.0
    finally:
        _restore_platform(old)


def test_wait_for_device_gives_up_at_deadline():
    # an unknown platform makes every probe error fast; the wait must retry
    # within the deadline and then return False instead of looping forever
    old = _with_platform("nonexistent")
    try:
        t0 = time.monotonic()
        assert wait_for_device(deadline_s=8.0, probe_timeout_s=60.0) is False
        assert time.monotonic() - t0 < 120.0
    finally:
        _restore_platform(old)


def test_wait_for_device_disabled():
    assert wait_for_device(deadline_s=0) is True


def test_main_emits_error_record_on_failure(monkeypatch, capsys):
    """If the bench body dies (e.g. backend still down at round end), main
    must still print its one JSON line — an honest zero-value record with
    the error named — and re-raise."""
    import json

    from bin_tpu import benchmark

    def boom(args):
        raise RuntimeError("FAILED_PRECONDITION: backend unavailable")

    monkeypatch.setattr(benchmark, "_run", boom)
    with pytest.raises(RuntimeError, match="backend unavailable"):
        benchmark.main(["--device-wait", "0"])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    record = json.loads(lines[-1])
    assert record["value"] == 0.0
    assert "backend unavailable" in record["error"]
    assert record["metric"].startswith("frames/sec/chip")


def test_load_auto_overrides(tmp_path):
    """Measurement-gated bench overrides: absent file = no-op; valid file =
    override strings + provenance note; corrupt file = ignored, not fatal
    (an unattended round-end bench must never die on a bad sidecar)."""
    from bin_tpu.benchmark import load_auto_overrides

    ov, note = load_auto_overrides(str(tmp_path / "nope.json"))
    assert ov == [] and note is None

    p = tmp_path / "BENCH_OVERRIDES.json"
    p.write_text(json.dumps({"overrides": {"model.conv_int8_min_cin": 0},
                             "reason": "QAT verdict"}))
    ov, note = load_auto_overrides(str(p))
    assert ov == ["model.conv_int8_min_cin=0"]
    assert note["reason"] == "QAT verdict"

    p.write_text("{corrupt")
    ov, note = load_auto_overrides(str(p))
    assert ov == [] and note is None
