"""The driver contract: ``dryrun_multichip`` must self-bootstrap.

Round 1's official multi-chip record failed (MULTICHIP_r01.json ok=false)
because the entry point assumed enough visible devices. The contract now:
``python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"`` succeeds
with NO env vars set, even when the backend would come up with one device.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    return env


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_without_env():
    """Fresh process, no env vars: in-process CPU-mesh bootstrap."""
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
    assert "e2e serving" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_reexecs_when_backend_claimed():
    """Backend already initialised with 1 device: subprocess re-exec."""
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "assert len(jax.devices()) == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(), cwd=REPO, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
