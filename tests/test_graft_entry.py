"""Guard tests for the driver entry points in __graft_entry__.py.

Round 2 shipped a broken multichip dryrun because a kernel signature
changed (`_viterbi_iteration` gained a per-column switch-cost array)
without the dryrun being re-run. These tests call the driver entry
points exactly as the driver does — dryrun_multichip(8) in a fresh
subprocess on a forced 8-device CPU platform — so any future signature
drift fails the suite, not the round artifact.
"""

import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles_and_runs():
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as graft
    finally:
        sys.path.remove(REPO)
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    leaves = jax.tree_util.tree_leaves(out)
    assert leaves, "entry() returned no arrays"
    for leaf in leaves:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_dryrun_multichip_8_devices_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # mirror the driver invocation; jax.config.update after import beats
    # any sitecustomize platform override (see tests/conftest.py)
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed:\n{proc.stdout}\n{proc.stderr}"
    )
