"""Driver-surface tests for __graft_entry__.

The driver judges multi-chip correctness by running
``python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"``
in a fresh interpreter where the environment pins a single-chip platform
(JAX_PLATFORMS=axon via sitecustomize). dryrun_multichip must self-configure
an 8-device virtual CPU mesh in that situation (round-1 VERDICT item 1).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_configures_fresh_interpreter():
    """The exact driver command, with NO mesh-related env overrides."""
    env = dict(os.environ)
    # Strip anything the test harness set up so the subprocess sees what the
    # driver sees (sitecustomize will still pin JAX_PLATFORMS at startup).
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("UNIMM_JAX_CACHE", "/tmp/unimm_jax_cache")
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=580)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok: 8 devices" in proc.stdout, proc.stdout


def test_dryrun_multichip_inprocess_with_enough_devices():
    """With the 8-device CPU mesh already active (conftest), no re-exec."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
