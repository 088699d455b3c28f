"""The example walkthrough runs end-to-end (docs-as-tests)."""

import pathlib
import subprocess
import sys


def test_active_sampling_example():
    root = pathlib.Path(__file__).resolve().parents[1]
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/tmp",
        "PYTHONPATH": str(root),
        "JAX_PLATFORMS": "cpu",
        "MPLBACKEND": "Agg",
    }
    r = subprocess.run(
        [sys.executable, str(root / "examples" / "active_sampling.py"),
         "--steps", "1", "--n-hyper", "3"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(root),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "true Z" in r.stdout and "marginalized" in r.stdout
