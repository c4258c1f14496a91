"""Data-parallel serving over the 8-device virtual mesh: sharded window
batches must produce the same logits as single-device execution."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthetic_audio_detection_tpu.ensemble.multihead import build_ensemble
from synthetic_audio_detection_tpu.infer.pipeline import InferencePipeline
from synthetic_audio_detection_tpu.models.classifier import (
    BinaryClassifier,
    init_classifier,
)
from synthetic_audio_detection_tpu.parallel import sharding as sh
from synthetic_audio_detection_tpu.utils.config import (
    AudioConfig,
    InferenceConfig,
    SpectrogramConfig,
)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs virtual devices")
def test_mesh_sharded_logits_match_single_device(rng):
    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["A", "B", "Real"],
                         detect_shared_backbone=False)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=64)
    windows = (rng.standard_normal((16, 32_000)) * 0.3).astype(np.float32)

    single = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=16), use_pallas=False
    )
    ref = single.logits_for_windows(windows)

    mesh = sh.create_mesh(data_parallel=8, model_parallel=1)
    sharded = InferencePipeline(
        ens, spec=spec, infer=InferenceConfig(batch_size=16),
        use_pallas=False, mesh=mesh,
    )
    got = sharded.logits_for_windows(windows)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # odd-sized batch exercises bucket rounding to the mesh multiple
    got7 = sharded.logits_for_windows(windows[:7])
    np.testing.assert_allclose(got7, ref[:7], rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_weak_scaling_program_invariance(rng):
    """The 'linear scale-out' claim for data-parallel serving (SURVEY §2.4,
    ICI-within/DCN-across): at n=1/2/4/8 devices with the per-device batch
    held constant, the compiled SPMD serving program must be collective-free
    (no cross-device communication anywhere in the inference path) and do
    the SAME per-device work — i.e. scaling out multiplies throughput
    because each chip runs the identical program on its shard, not a
    program plus communication."""
    import re

    model = BinaryClassifier(backbone="resnet18")
    vds = [init_classifier(model, jax.random.PRNGKey(i), input_size=64)
           for i in range(2)]
    ens = build_ensemble(model, vds, ["A", "B", "Real"],
                         detect_shared_backbone=False)
    spec = SpectrogramConfig(mel_norm="slaney", out_size=64)

    per_device_batch = 2
    flops_per_device = {}
    for n in (1, 2, 4, 8):
        mesh = sh.create_mesh(data_parallel=n, model_parallel=1,
                              devices=jax.devices()[:n])
        pipe = InferencePipeline(
            ens, spec=spec, infer=InferenceConfig(batch_size=n * per_device_batch),
            use_pallas=False, mesh=mesh,
        )
        batch = jax.ShapeDtypeStruct(
            (n * per_device_batch, 32_000), jnp.float32,
            sharding=sh.batch_sharded(mesh, 2))
        compiled = pipe._jit_fwd.lower(ens.variables, batch).compile()
        text = compiled.as_text()
        hits = re.findall(
            r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
            r"reduce-scatter|collective-broadcast)\b", text)
        assert not hits, f"collectives in n={n} serving program: {set(hits)}"

        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_device[n] = float(cost.get("flops", 0.0))

    # per-device work is constant as devices scale (weak-scaling invariance)
    base = flops_per_device[1]
    assert base > 0.0
    for n in (2, 4, 8):
        assert flops_per_device[n] == pytest.approx(base, rel=0.02), (
            f"per-device flops changed at n={n}: {flops_per_device}")


@pytest.mark.slow
@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_weak_scaling_train_program_invariance():
    """Train-step twin of the serving invariance test above (the round-4
    GSPMD bug — full-batch all-gathers silently de-parallelizing layers —
    was caught by exactly this test class). For the JOINT train step under
    pure data parallelism at n=1/2/4/8 with per-device batch constant:

    - the only collectives in the compiled program are all-reduces (the
      gradient/batch-stat reductions); any all-gather / all-to-all /
      collective-permute means GSPMD replicated work it should have kept
      sharded;
    - the all-reduce COUNT is invariant in n (one reduction per reduced
      quantity, not per device);
    - per-device flops are constant as n grows (weak scaling: each chip
      runs the same program on its shard)."""
    import re

    from synthetic_audio_detection_tpu.train import joint
    from synthetic_audio_detection_tpu.utils.config import (
        SpecAugmentConfig,
        TrainConfig,
    )

    per_device_batch = 2
    spec = SpectrogramConfig(out_size=64)
    stats = {}
    for n in (1, 2, 4, 8):
        cfg = TrainConfig(batch_size=n * per_device_batch)
        state, tx = joint.init_joint_state(
            "resnet18", 2, jax.random.PRNGKey(0), cfg, (64, 64))
        step = jax.jit(joint.make_joint_train_step(
            "resnet18", tx, cfg, spec, SpecAugmentConfig(enabled=False),
            num_heads=2, stop_grad_stage=4))
        mesh = sh.create_mesh(data_parallel=n, model_parallel=1,
                              devices=jax.devices()[:n])
        sharded_state = sh.replicate(mesh, state)
        batch_sds = {
            "audio": jax.ShapeDtypeStruct(
                (cfg.batch_size, 32_000), jnp.float32,
                sharding=sh.batch_sharded(mesh, 2)),
            "label": jax.ShapeDtypeStruct(
                (cfg.batch_size,), jnp.int32,
                sharding=sh.batch_sharded(mesh, 1)),
        }
        compiled = step.lower(
            sharded_state, batch_sds, jax.random.PRNGKey(1)).compile()
        text = compiled.as_text()
        bad = re.findall(
            r"\b(all-gather|all-to-all|collective-permute|"
            r"collective-broadcast)\b", text)
        assert not bad, f"non-reduce collectives at n={n}: {set(bad)}"
        n_allreduce = len(re.findall(r"\ball-reduce(?:-start)?\b", text))
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        stats[n] = (n_allreduce, float(cost.get("flops", 0.0)))

    base_ar, base_flops = stats[1]
    assert base_flops > 0.0
    for n in (2, 4, 8):
        ar, flops = stats[n]
        assert flops == pytest.approx(base_flops, rel=0.02), (
            f"per-device flops changed at n={n}: {stats}")
        if n > 1:
            # all-reduce count settles at n=2 and must not grow with n
            assert ar == stats[2][0], (
                f"all-reduce count grew with n: {stats}")
