"""tools/bench_compare.py — min-of-pair math, shape normalization
(driver wrapper vs bench output, short vs full keys), and the
ambient-band finding filter."""

from __future__ import annotations

import json
import subprocess
import sys


def _write(path, obj):
    path.write_text(json.dumps(obj))
    return str(path)


def _run(*args):
    return subprocess.run(
        [sys.executable, "tools/bench_compare.py", *args],
        capture_output=True, text=True,
    )


def test_min_of_pair_and_band_filter(tmp_path):
    a = _write(tmp_path / "a.json", {"queries": {
        "q01_x": 1.0, "q02_y": 9.0, "q03_z": 0.4}})
    b = _write(tmp_path / "b.json", {"queries": {
        "q01_x": 2.0, "q02_y": 4.0, "q03_z": 0.5}})
    # driver wrapper shape + short keys for the baseline
    base = _write(tmp_path / "base.json", {"parsed": {"queries": {
        "q01": 1.0, "q02": 2.0, "q03": 0.1}}})
    r = _run(a, b, base)
    # q02 min-of-pair 4.0 vs 2.0 = 2.0x and >= 2s -> a finding, exit 1
    assert r.returncode == 1, r.stdout
    assert "q02" in r.stdout and "x 2.00" in r.stdout
    # q03 is 4-5x but sub-2s min-of-pair -> band-filtered, NOT a finding
    assert "('q03'" not in r.stdout.split("findings")[1].splitlines()[0]
    assert "min-of-pair 5.4" in r.stdout  # 1.0 + 4.0 + 0.4


def test_clean_pair_exits_zero(tmp_path):
    a = _write(tmp_path / "a.json", {"queries": {"q01_x": 1.0, "q09_n": 3.0}})
    base = _write(tmp_path / "base.json", {"queries": {"q01_x": 1.1}})
    r = _run(a, base)
    assert r.returncode == 0, r.stdout
    assert "findings" in r.stdout and "none" in r.stdout
    assert "new queries" in r.stdout and "q09" in r.stdout
