"""Standalone measurement scripts; bench.py imports shared builders from
here (benchmarks.fleet_esm) so the driver metric and the sweeps time the
exact same program."""
