"""True 2-process jax.distributed test (CPU backend, 4 devices per process).

Validates multi-host behaviour the 8-virtual-device single-process tests
cannot: jax.distributed.initialize, a global mesh spanning processes, the
ZeRO-1 sharded train step with cross-process gradient reduction, and the
orbax multi-process-coordinated checkpoint save (every process participates —
no rank gating, no device_get of non-addressable shards).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


# Workers compile a tiny CamContextI2V graph each; standalone that is ~3-7
# min, but under full-suite + TPU-queue load it has exceeded 15 min (round-3
# suite run killed both workers at 900s). Generous ceiling, cheap when green.
_DEADLINE_S = 2400


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    ckpt_dir = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(i), ckpt_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=_DEADLINE_S)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "OK" in out, out[-2000:]
    # both processes reported the SAME loss (global reduction)
    losses = []
    for out in outs:
        for line in out.splitlines():
            if "loss=" in line:
                losses.append(float(line.split("loss=")[1].split()[0]))
    assert len(losses) == 2 and abs(losses[0] - losses[1]) < 1e-6, losses
    # the coordinated checkpoint exists exactly once
    import glob

    steps = glob.glob(os.path.join(ckpt_dir, "*"))
    assert steps, "no checkpoint written"


_GEN_WORKER = os.path.join(os.path.dirname(__file__), "multihost_gen_worker.py")


@pytest.mark.slow
def test_two_process_generation_disjoint_shards(tmp_path):
    """Multi-host generation (VERDICT r2 #4): each process runs the real
    02_generate_videos.py CLI over a rank-strided loader shard; the two
    shards must be disjoint and jointly cover the dataset.

    reference: 02_generate_videos.py:461-621 generates on all DDP ranks via
    trainer.test (main/trainer.py:192-194)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_harness_e2e import make_e2e_workspace

    root = tmp_path / "ws"
    root.mkdir()
    _, cfg_path, _ = make_e2e_workspace(root)

    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    outs_dirs = [str(tmp_path / f"gen{i}") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, _GEN_WORKER, coordinator, "2", str(i), cfg_path, outs_dirs[i]],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=_DEADLINE_S)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "OK" in out, out[-2000:]
    shards = []
    for out in outs:
        line = [ln for ln in out.splitlines() if "wrote" in ln and "OK" in ln][-1]
        shards.append(set(line.split("wrote ")[1].split(" OK")[0].split(",")))
    assert shards[0] and shards[1], shards
    assert not (shards[0] & shards[1]), f"overlapping shards: {shards}"
    assert shards[0] | shards[1] == {"a", "b"}, shards
