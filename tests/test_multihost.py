"""Multi-process SPMD readiness (SURVEY §2.10; VERDICT r4 item 6).

Two real OS processes x 4 virtual CPU devices each join one 8-device
global mesh via ``init_distributed`` (collectives ride gloo — the CPU
stand-in for DCN+ICI). ``test_two_process_trainstep`` is the quick
wiring proof (toy model, put_global batches, psum gradient reduction,
bitwise-identical replicated params on both ranks).

The FULL production path (ArtiBoostLoader pose sweep + sharded render +
pipelined mixed step + mining reweight across 2 processes) lives in
``script/dryrun_multihost.py`` — heavyweight (two concurrent interpret-
mode renders on one core), so it is gated behind RUN_MULTIHOST_FULL=1;
its standing proof log is docs/multihost_dryrun_r5.log.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(code_or_argv, n=2):
    """Launch n ranks, return their outputs (raises on nonzero exit)."""
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # each rank sets its own device count
    env["PYTHONPATH"] = REPO  # note: NOT the TPU plugin site dir
    for pid in range(n):
        argv = (code_or_argv(pid) if callable(code_or_argv)
                else code_or_argv + [str(pid)])
        procs.append(subprocess.Popen(
            argv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out.decode())
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


def test_two_process_trainstep():
    port = _free_port()
    code = textwrap.dedent(f"""
        import os, sys
        os.environ["XLA_FLAGS"] = (
            "--xla_force_host_platform_device_count=4"
            " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_enable_async_dispatch", False)
        import numpy as np
        import jax.numpy as jnp
        import optax
        import flax.linen as nn
        from artiboost_tpu.parallel import (create_train_state, get_mesh,
                                            init_distributed, put_global,
                                            shard_batch)
        from artiboost_tpu.parallel.mesh import replicated_sharding
        from artiboost_tpu.parallel import make_train_step
        from artiboost_tpu.criterions.criterion import Criterion
        from artiboost_tpu.criterions.jointloss import JointsLoss
        from artiboost_tpu.datasets.hoquery import Queries

        pid = int(sys.argv[1])
        init_distributed("localhost:{port}", 2, pid)
        assert jax.process_count() == 2 and len(jax.devices()) == 8
        mesh = get_mesh()

        class Toy(nn.Module):
            @nn.compact
            def __call__(self, batch, train=False):
                feat = nn.Dense(8)(jnp.mean(batch[Queries.IMAGE], axis=(1, 2)))
                B = feat.shape[0]
                root = batch[Queries.ROOT_JOINT][:, None]
                return {{"joints_3d_abs":
                         nn.Dense(63)(feat).reshape(B, 21, 3) + root,
                         "corners_3d_abs":
                         nn.Dense(24)(feat).reshape(B, 8, 3) + root}}

        rng = np.random.RandomState(0)  # same data on every process
        B = 16
        batch = {{
            Queries.IMAGE: rng.rand(B, 8, 8, 3).astype(np.float32),
            Queries.ROOT_JOINT: np.tile([0, 0, .5], (B, 1)).astype(np.float32),
            Queries.JOINTS_3D: rng.randn(B, 21, 3).astype(np.float32) * .05,
            Queries.CORNERS_3D: rng.randn(B, 8, 3).astype(np.float32) * .05,
            Queries.JOINTS_VIS: np.ones((B, 21), np.float32),
            Queries.CORNERS_VIS: np.ones((B, 8), np.float32),
        }}
        arch = Toy()
        crit = Criterion({{"LAMBDAS": [1.0]}},
                         [JointsLoss(LAMBDA_JOINTS_3D=1.0,
                                     LAMBDA_CORNERS_3D=1.0)])
        opt = optax.adam(1e-2)
        state = create_train_state(arch, opt, batch, jax.random.PRNGKey(0),
                                   mesh=mesh)
        step = make_train_step(arch, crit, opt, mesh)
        gbatch = shard_batch(batch, mesh)  # put_global path
        for r in range(2):
            state, _, losses = step(state, gbatch, jax.random.PRNGKey(1 + r))
        loss = float(losses["final_loss"])  # replicated -> fetchable
        import hashlib
        h = hashlib.md5()
        for leaf in jax.tree_util.tree_leaves(state.params):
            h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
        print(f"OK proc={{pid}} loss={{loss:.8f}} hash={{h.hexdigest()}}",
              flush=True)
    """)
    outs = _spawn(lambda pid: [sys.executable, "-c", code, str(pid)])
    lines = [[ln for ln in o.splitlines() if ln.startswith("OK ")][0]
             for o in outs]
    # both ranks computed, and computed the SAME replicated state
    h0, h1 = (ln.split("hash=")[1] for ln in lines)
    l0, l1 = (ln.split("loss=")[1].split()[0] for ln in lines)
    assert h0 == h1 and l0 == l1, lines


@pytest.mark.skipif(not os.environ.get("RUN_MULTIHOST_FULL"),
                    reason="full 2-process ArtiBoost dryrun is heavy; "
                           "set RUN_MULTIHOST_FULL=1 (proof log: "
                           "docs/multihost_dryrun_r5.log)")
def test_dryrun_multihost_full():
    port = _free_port()
    outs = _spawn(lambda pid: [
        sys.executable, os.path.join(REPO, "script", "dryrun_multihost.py"),
        "--process_id", str(pid), "--num_processes", "2", "--port", str(port)])
    lines = [[ln for ln in o.splitlines() if ln.startswith("MULTIHOST_OK")][0]
             for o in outs]
    h0, h1 = (ln.split("hash=")[1] for ln in lines)
    assert h0 == h1, lines
