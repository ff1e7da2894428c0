"""bench.py supervisor contract: the driver runs `python bench.py` and
records its rc + single JSON line, so the supervise() semantics are a
driver-facing API — pin them.

- rc=0: probe alive, child prints one JSON line → re-printed verbatim.
- rc=2: probe never passes within the retry window → 'tunnel down'.
- rc=3: probe passes but the child fails (sticky across attempts —
  a probe blip on the final attempt must NOT relabel a framework error
  as the tunnel wedge; caught live in queue-B item 26, BENCH_NOTES
  'bench.py tome16 fields').
"""

import importlib.util
import json
import os
import subprocess
import sys
import types

import pytest


@pytest.fixture()
def bench(monkeypatch):
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # no real sleeping/retrying in tests
    monkeypatch.setattr(mod, "_RETRY_WINDOW_S", 0.0)
    monkeypatch.setattr(mod.time, "sleep", lambda s: None)
    return mod


def _fake_run(stdout="", returncode=0, hang=False):
    def run(cmd, **kw):
        if hang:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))
        return types.SimpleNamespace(stdout=stdout, returncode=returncode)
    return run


def test_rc0_reprints_the_json_line(bench, monkeypatch, capsys):
    line = json.dumps({"metric": "x", "value": 1.0})
    monkeypatch.setattr(bench, "_probe_alive", lambda: True)
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run(stdout="noise\n" + line + "\n"))
    assert bench.supervise([]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == [line]


def test_rc2_when_probe_never_passes(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_alive", lambda: False)
    assert bench.supervise([]) == 2
    assert "tunnel down" in capsys.readouterr().err


def test_rc3_when_child_fails_while_probe_alive(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_alive", lambda: True)
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run(stdout="Traceback ...\n", returncode=1))
    assert bench.supervise([]) == 3
    err = capsys.readouterr().err
    assert "not the" in err and "tunnel" in err.lower()


def test_rc3_sticky_across_probe_blip(bench, monkeypatch, capsys):
    """Child fails on attempt 1 (probe alive); probe blips on attempt 2
    as the window closes → still rc=3, not the rc=2 wedge message."""
    probes = iter([True, False])
    window = {"first": True}

    def probe():
        return next(probes)

    real_monotonic = bench.time.monotonic

    def monotonic():
        # first deadline check passes (one retry), later ones exceed
        if window["first"]:
            window["first"] = False
            return real_monotonic() - 1e6
        return real_monotonic() + 1e6

    monkeypatch.setattr(bench, "_probe_alive", probe)
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run(stdout="boom\n", returncode=1))
    monkeypatch.setattr(bench.time, "monotonic", monotonic)
    assert bench.supervise([]) == 3
    assert "tunnel down" not in capsys.readouterr().err


def test_rc3_when_child_prints_no_json(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_alive", lambda: True)
    monkeypatch.setattr(bench.subprocess, "run",
                        _fake_run(stdout="no json here\n", returncode=0))
    assert bench.supervise([]) == 3
    assert "no JSON line" in capsys.readouterr().err


def test_rc3_when_child_hangs(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_alive", lambda: True)
    monkeypatch.setattr(bench.subprocess, "run", _fake_run(hang=True))
    rc = bench.supervise([])
    err = capsys.readouterr().err
    assert "timed out" in err
    # a mid-run hang with a live probe is a child failure, not the wedge
    assert rc == 3
