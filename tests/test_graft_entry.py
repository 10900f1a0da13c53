"""Driver-shaped tests for __graft_entry__: these run in a FRESH
subprocess with a clean environment (no conftest-provided virtual
devices), exactly like the round driver does — the configuration that
failed in round 1 (MULTICHIP_r01.json: assert on device count).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    # Strip everything the test harness injected so the child looks like
    # the driver's stock invocation.
    env.pop("_PROTON_DRYRUN_CHILD", None)
    env.pop("JAX_PLATFORMS", None)
    xla = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in xla.split()
        if not f.startswith("--xla_force_host_platform_device_count"))
    # Keep the child off the (possibly busy) TPU: the driver itself runs
    # on whatever default backend exists; CPU is always present.
    env.setdefault("PROTON_TPU_PLATFORM", "cpu")
    return env


@pytest.mark.slow
def test_dryrun_multichip_driver_shaped():
    code = ("import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO)
    res = subprocess.run([sys.executable, "-c", code], env=_clean_env(),
                         cwd=REPO, capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "across 8 devices" in res.stdout


@pytest.mark.slow
def test_entry_compiles_driver_shaped():
    code = ("import sys; sys.path.insert(0, %r); "
            "import jax, __graft_entry__ as g; "
            "fn, args = g.entry(); out = jax.jit(fn)(*args); "
            "jax.block_until_ready(out); print('entry ok', out.shape)"
            % REPO)
    res = subprocess.run([sys.executable, "-c", code], env=_clean_env(),
                         cwd=REPO, capture_output=True, text=True,
                         timeout=600)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "entry ok" in res.stdout
