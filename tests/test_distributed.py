"""Multi-process distributed backend smoke test (SURVEY.md §2.4 multi-node):
two OS processes, each a JAX "host" with its own CPU devices, joined through
initialize_distributed (coordinator + Gloo), computing one cross-process
collective. This is the real jax.distributed path the reference's
DataParallel/num_gpus surface maps onto for multi-host TPU pods."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    from synthetic_audio_detection_tpu.parallel.sharding import (
        create_mesh, initialize_distributed, shard_batch,
    )
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    initialize_distributed("127.0.0.1:" + port, nproc, pid)
    assert jax.process_count() == nproc
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = create_mesh()  # spans ALL processes' devices
    local = np.full((jax.local_device_count(), 2), pid + 1.0, np.float32)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local)
    total = jax.jit(lambda a: jnp.sum(a),
                    out_shardings=NamedSharding(mesh, P()))(x)
    print("DIST_SUM", float(total), flush=True)
""" % REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_collective():
    port = str(_free_port())
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)  # one device per process: a real 2-host shape
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed smoke test timed out (coordinator hang?)")
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\n{out}\n{err[-2000:]}"
        # sum over 2 procs x local_devices x 2 cols of (pid+1):
        # proc0 contributes 1*n0*2, proc1 2*n1*2; with 1 device each = 6
        assert "DIST_SUM 6.0" in out, out


def test_initialize_distributed_plumbing(monkeypatch):
    """Single-process → no-op; multi-process → args passed through."""
    import jax

    from synthetic_audio_detection_tpu.parallel import sharding as sh

    calls = []
    monkeypatch.setattr(
        jax.distributed, "initialize", lambda **kw: calls.append(kw)
    )
    sh.initialize_distributed(None, None, None)
    sh.initialize_distributed("host:1", 1, 0)
    assert calls == []
    sh.initialize_distributed("host:1234", 4, 2)
    assert calls == [{
        "coordinator_address": "host:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


TRAIN_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from synthetic_audio_detection_tpu.parallel.sharding import (
        batch_sharded, create_mesh, initialize_distributed, replicate,
    )
    initialize_distributed("127.0.0.1:" + port, nproc, pid)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig, SpectrogramConfig, TrainConfig,
    )

    mesh = create_mesh()
    cfg = TrainConfig(batch_size=1)
    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(
        model, jax.random.PRNGKey(0), cfg, input_size=64)
    step = jax.jit(steps.make_train_step(
        model, tx, cfg, SpectrogramConfig(out_size=64), SpecAugmentConfig(),
        sample_rate=32_000))
    rows_here = 2 * jax.local_device_count()
    rng = np.random.default_rng(pid)
    local = {
        "audio": (rng.standard_normal((rows_here, 32_000)) * 0.2
                  ).astype(np.float32),
        "label": np.tile([0, 1], rows_here // 2).astype(np.int32),
        "weight": np.ones(rows_here, np.float32),
    }
    with mesh:
        state = replicate(mesh, state)
        batch = {
            k: jax.make_array_from_process_local_data(
                batch_sharded(mesh, np.asarray(v).ndim), np.asarray(v))
            for k, v in local.items()
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss)
    print("DP_TRAIN_LOSS %%.6f" %% loss, flush=True)
""" % REPO)


def test_two_process_data_parallel_train_step():
    """One jitted train step with the global batch sharded across TWO OS
    processes: the gradient all-reduce rides the cross-process collective
    path and both hosts must see the identical (replicated) loss."""
    port = str(_free_port())
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TRAIN_CHILD, str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    losses = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=1800)
            assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
            line = [l for l in out.splitlines() if l.startswith("DP_TRAIN_LOSS")]
            assert line, out
            losses.append(float(line[0].split()[1]))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed train-step smoke timed out")
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


TWO_AXIS_CHILD = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %r)
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from synthetic_audio_detection_tpu.parallel.sharding import (
        batch_sharded, create_mesh, head_sharded, initialize_distributed,
        replicate, shard_ensemble_heads,
    )
    initialize_distributed("127.0.0.1:" + port, nproc, pid)
    assert jax.local_device_count() == 4, jax.local_device_count()
    assert jax.device_count() == 8
    import numpy as np
    import jax.numpy as jnp
    from synthetic_audio_detection_tpu.models.classifier import BinaryClassifier
    from synthetic_audio_detection_tpu.train import steps
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig, SpectrogramConfig, TrainConfig,
    )

    # process-spanning mesh with BOTH axes: data(2) ACROSS the processes
    # (DCN row), model(4) WITHIN each process (ICI row) — jax.devices()
    # orders process 0's devices first, so reshape(2, 4) puts one process
    # per data row.
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    import __graft_entry__ as g
    cfg = TrainConfig(batch_size=1)
    model = BinaryClassifier(backbone="resnet18")
    state, tx = steps.create_train_state(
        model, jax.random.PRNGKey(0), cfg, input_size=64)
    step = jax.jit(steps.make_train_step(
        model, tx, cfg, SpectrogramConfig(out_size=64), SpecAugmentConfig(),
        sample_rate=32_000))
    rows_here = 2  # data axis is 2-wide globally -> 2 rows per process
    rng = np.random.default_rng(pid)
    local = {
        "audio": (rng.standard_normal((rows_here, 32_000)) * 0.2
                  ).astype(np.float32),
        "label": np.tile([0, 1], rows_here // 2).astype(np.int32),
        "weight": np.ones(rows_here, np.float32),
    }
    with mesh:
        state = replicate(mesh, state)
        batch = {
            k: jax.make_array_from_process_local_data(
                batch_sharded(mesh, np.asarray(v).ndim), np.asarray(v))
            for k, v in local.items()
        }
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss = float(np.asarray(metrics["loss"]))
    assert np.isfinite(loss)

    # head-sharded (expert-parallel) ensemble forward over the SAME mesh:
    # 4 heads over model(4) within each process, batch over data(2) across
    from synthetic_audio_detection_tpu.ensemble.multihead import (
        ensemble_forward,
    )
    ens = g._flagship_ensemble(n_heads=4)
    import dataclasses
    def fwd(variables, x):
        return ensemble_forward(
            dataclasses.replace(ens, variables=variables), x)
    jfwd = jax.jit(fwd)
    xs_local = np.random.default_rng(10).standard_normal(
        (1, 64, 64, 3)).astype(np.float32)
    with mesh:
        head_vars = shard_ensemble_heads(mesh, ens.variables)
        xg = jax.make_array_from_process_local_data(
            batch_sharded(mesh, 4), xs_local)
        logits = fwd_out = jfwd(head_vars, xg)
        jax.block_until_ready(logits)
    assert logits.shape == (2, 5), logits.shape
    print("TWO_AXIS_LOSS %%.6f" %% loss, flush=True)
""" % REPO)


def test_two_process_four_device_two_axis_mesh():
    """A process-spanning 2×4 mesh with BOTH axes live — data parallel across
    the processes (the DCN direction), ensemble heads sharded within each
    process (the ICI direction) — runs one jitted train step and one
    expert-parallel ensemble forward; the replicated loss must agree
    (SURVEY.md §2.4 multi-node row)."""
    port = str(_free_port())
    env = dict(os.environ, PYTHONPATH=REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", TWO_AXIS_CHILD, str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    losses = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=2400)
            assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
            line = [l for l in out.splitlines()
                    if l.startswith("TWO_AXIS_LOSS")]
            assert line, out
            losses.append(float(line[0].split()[1]))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-axis distributed smoke timed out")
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
