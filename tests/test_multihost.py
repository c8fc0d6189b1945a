"""Multi-host (multi-process) dryrun: 2 OS processes x 2 virtual CPU devices
each, joined by ``jax.distributed`` (Gloo over TCP — the CI stand-in for
DCN), running one full data-parallel PPO-Lag train step over the 4-device
global mesh. SURVEY.md §2.9/§7.8: the reference has no distributed layer at
all; this is the new framework's cross-host path."""

import os
import socket
import subprocess
import sys



def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dryrun():
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    port = _free_port()
    # The workers must be PURE-CPU processes: scrub any accelerator-plugin
    # environment (e.g. a tunneled-TPU PJRT plugin injected via a PYTHONPATH
    # site dir + TPU_*/PJRT_* vars). If a plugin registers inside the worker,
    # its backend becomes the default and jax.process_count() reports the
    # plugin's topology (1) instead of the Gloo cluster's.
    env = {
        k: v for k, v in os.environ.items()
        if not (k.startswith(("TPU_", "PJRT_", "AXON", "PALLAS_AXON"))
                or k in ("JAX_PLATFORMS", "_AXON_REGISTERED"))
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon" not in p])
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHOK"):
                _, pid_s, loss_s = line.split()
                losses[int(pid_s)] = float(loss_s)
    assert set(losses) == {0, 1}, outs
    # the replicated train state must yield the identical loss on both hosts
    assert losses[0] == losses[1], losses
