"""Driver-contract guards: entry() traces, dryrun_multichip runs."""
import sys

import numpy as np
import jax

sys.path.insert(0, "/root/repo")


def test_entry_traces():
    """entry() must return a jittable fn + args; eval_shape catches
    signature/shape breaks without compiling the 1B model."""
    from __graft_entry__ import entry

    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == ()


def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)
    dryrun_multichip(3)  # odd count falls back to pure dp


def test_dryrun_multichip_bare_subprocess():
    """Run dryrun_multichip(8) exactly the way the driver does: a bare
    python process with NO env preparation (no XLA_FLAGS, no JAX_PLATFORMS,
    no conftest) — the function must self-bootstrap the virtual CPU mesh.
    Round-1 failed this contract (MULTICHIP_r01.json rc=1)."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
    assert "OK" in r.stdout


def test_dryrun_multichip_after_cpu_backend_init():
    """If a CPU backend already initialized with too few devices (e.g. the
    driver touched jax.devices() first), dryrun must reset backends and
    still find 8 virtual devices."""
    import os
    import subprocess

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = "cpu"
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "assert len(jax.devices()) < 8;"  # backend up with 1 device
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd="/root/repo",
                       env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout={r.stdout}\nstderr={r.stderr}"
