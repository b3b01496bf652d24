"""Importing the package must never initialize an XLA backend.

Regression test for VERDICT r4 #1: ``dryrun_multichip`` bootstraps a virtual
CPU mesh and must run with zero TPU contact, but module-level eager jnp
constants (``data/device_augment.py`` pre-r5) dispatched to the ambient
axon/TPU backend at *import* time — before the bootstrap could switch
platforms. This runs in a subprocess (this process's conftest already built
the CPU backend) and walks every package module, asserting the backend
registry stays empty throughout.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import pkgutil, importlib, sys
import jax._src.xla_bridge as xb
import dinov2_distillation_tpu as pkg

bad = []
for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
    before = dict(xb._backends)
    importlib.import_module(m.name)
    if xb._backends != before:
        bad.append(m.name)
assert not bad, f"imports initialized an XLA backend: {bad}"
assert not xb._backends, f"backends created during import walk: {list(xb._backends)}"
print("OK")
"""


def test_package_import_initializes_no_backend():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Preserve the axon sitecustomize path (CLAUDE.md): the point is that the
    # ambient backend IS the TPU tunnel and importing must still not touch it.
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT], env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout


def test_graft_entry_dryrun_stays_on_cpu():
    """dryrun_multichip must bootstrap the CPU mesh before any package
    import and never query a non-CPU backend (the r4 failure was an eager
    op hitting the axon tunnel mid-import)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax._src.xla_bridge as xb\n"
        "import __graft_entry__ as g\n"
        "assert not xb._backends, 'importing __graft_entry__ built a backend'\n"
        "g.dryrun_multichip(4)\n"
        "assert set(xb._backends) == {'cpu'}, list(xb._backends)\n"
        "print('OK')\n" % repo
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "OK" in proc.stdout


# The dryrun itself compiles a full (tiny) training step twice on a 1-CPU
# host — minutes, not seconds.
test_graft_entry_dryrun_stays_on_cpu = pytest.mark.slow(
    test_graft_entry_dryrun_stays_on_cpu)


def test_dryrun_falls_back_to_subprocess_when_backend_preexists():
    """If the calling process already initialized an XLA client (the driver
    compile-checks entry() on the TPU first), XLA_FLAGS can no longer grow
    the CPU device count — jax 0.9 also dropped clear_backends, so the r4-
    era 'clear and retry' silently did nothing. dryrun_multichip must detect
    this and re-exec itself in a fresh interpreter."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1  # flags parsed: 1-device ambient\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(4)\n"
        "print('FALLBACK OK')\n" % repo
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # ambient process must NOT have the flag
    proc = subprocess.run(
        [sys.executable, "-c", script], env=env,
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "FALLBACK OK" in proc.stdout


test_dryrun_falls_back_to_subprocess_when_backend_preexists = pytest.mark.slow(
    test_dryrun_falls_back_to_subprocess_when_backend_preexists)
