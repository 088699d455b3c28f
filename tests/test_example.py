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


def test_fleet_serving_example():
    """The fleet example runs end-to-end (CPU f64)."""
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "examples/fleet_serving.py", "--problems", "4",
         "--steps", "2", "--dtype", "float64"],
        capture_output=True, text=True, cwd=str(__import__("pathlib").Path(__file__).resolve().parents[1]),
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": str(__import__("pathlib").Path(__file__).resolve().parents[1])},
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "done:" in out.stdout


def test_active_sampling_2d_example():
    """The 2-D walkthrough runs end-to-end and hits its own accuracy
    assertions (CPU f64)."""
    root = pathlib.Path(__file__).resolve().parents[1]
    env = {
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/tmp",
        "PYTHONPATH": str(root),
        "JAX_PLATFORMS": "cpu",
        "MPLBACKEND": "Agg",
    }
    r = subprocess.run(
        [sys.executable, str(root / "examples" / "active_sampling_2d.py"),
         "--steps", "6", "--dtype", "float64"],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(root),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "rel err" in r.stdout
