"""bench.py contract tests: the driver consumes ONE JSON line from it at
the end of every round, so the fallback paths must always produce one."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_child_tiny_cpu_emits_json():
    """The last-ditch tiny CPU fallback must emit a well-formed line
    (regression: hidden=64 < group_size=128 made zero quant groups)."""
    env = dict(os.environ, BLAZR_BENCH_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"),
         "--child", "tiny-cpu-fallback"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-500:]
    line = next(ln for ln in reversed(r.stdout.splitlines())
                if ln.startswith("{"))
    d = json.loads(line)
    assert d["unit"] == "tok/s"
    assert d["value"] > 0
    assert "vs_baseline" in d
