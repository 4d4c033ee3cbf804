"""Driver-contract regression tests for __graft_entry__.

Round-1 failure mode (MULTICHIP_r01.json): ``dryrun_multichip`` assumed the
caller had already forced the virtual CPU mesh, so under the driver (jax
initialized on the 1-chip axon platform) it crashed.  It now re-execs itself
with the forced backend; these tests call it the way the driver does.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_parent_reexec():
    # Call from a parent env WITHOUT the forced-device env vars (strip the
    # ones conftest set) — the function must bootstrap the mesh itself.
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    code = "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok: mesh=data:4 x model:2" in proc.stdout


def test_entry_compiles():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    # args = (params, input_ids, attention_mask, type_ids): params must be
    # an explicit argument, not a closure capture — captured arrays become
    # HLO literals and overflow the axon relay's remote-compile body limit
    assert isinstance(args[0], dict)
    assert out.shape[0] == args[1].shape[0]
