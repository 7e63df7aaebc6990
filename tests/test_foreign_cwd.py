"""Round-4 gate: the driver contract must execute from ANY cwd.

Round-3's CORRECTNESS file came back empty because the driver ran with a cwd
other than /root/repo: the `sys.path` fix in __ray_entry__ only helped the
driver process, while Ray WORKERS died deserializing featherstore_ray kernels
(ModuleNotFoundError). The fix registers every featherstore_ray submodule
pickle-by-value so kernels ship embedded in the task spec.

This test reproduces the judge's exact scenario in a fresh subprocess: cwd is
a temp dir, ray.init happens there (so workers inherit the foreign cwd),
__ray_entry__ is loaded via spec_from_file_location by absolute path, and
three representative queries run end-to-end (a simple bucketed kernel, a
tokens-table kernel, and a chunked-suite kernel).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

SCRIPT = r"""
import os, sys
# simulate the driver: foreign cwd, repo NOT on sys.path / PYTHONPATH
assert os.getcwd() != {repo!r}
sys.path = [p for p in sys.path if os.path.abspath(p or os.getcwd()) != {repo!r}]

import ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         ignore_reinit_error=True)

import importlib.util
spec = importlib.util.spec_from_file_location(
    "__ray_entry__", os.path.join({repo!r}, "__ray_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

qs = mod.queries()
sf = "/root/testdata/sf0.001"
for name in ["latest_per_entity", "tokens_dedup", "feature_suite_chunked",
             "substring_dedup", "incremental_materialize", "decayed_topk",
             # round-4 session-3 families: tagged-union composite-key
             # joins, survival partials, iterative graph state, streaming
             # replay, multi-table as-of, salted join
             "band_join", "attribution", "kaplan_meier",
             "label_propagation", "streaming_dedup", "asof_multi",
             "hash_join_salted", "mlm_mask", "peak_concurrency"]:
    res = qs[name](sf)
    # Dataset -> count(); DataFrame/Table -> len (DataFrame.count() is
    # per-column and its Series truth value is ambiguous)
    n = res.count() if hasattr(res, "iter_batches") else len(res)
    assert n > 0, (name, n)
    print("OK", name, n, flush=True)
ray.shutdown()
print("ALL-OK", flush=True)
"""


def test_contract_runs_from_foreign_cwd(tmp_path):
    script = SCRIPT.format(repo=str(REPO))
    env = {k: v for k, v in __import__("os").environ.items()
           if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "ALL-OK" in proc.stdout, proc.stdout[-2000:]
