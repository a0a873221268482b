"""Multi-device sharding: sharded training step == single-device step.

The TPU-native analogue of multi-node testing (SURVEY.md §4): an 8-device
virtual CPU mesh with dp x tp sharding must produce numerically identical
trainable updates to the unsharded computation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pevit_tpu.config import get_default_config
from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
from pevit_tpu.parallel import clip_param_specs, make_mesh, replicate, shard_batch, shard_params
from pevit_tpu.peft import PeftConfig
from pevit_tpu.train import TaskStatic, TrainTask
from pevit_tpu.train.optim import make_optimizer
from pevit_tpu.train.trainer import build_epoch_fn

SPEC = CLIPSpec(
    embed_dim=64,
    vision=VisionSpec(input_resolution=32, patch_size=16, width=128, layers=2, heads=2, output_dim=64),
    text=TextSpec(context_length=16, vocab_size=128, width=64, heads=1, layers=2, output_dim=64),
)


def _setup(method="kadaptation"):
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 16
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.TPU.USE_PALLAS_ATTENTION = False
    clip_params = init_clip_params(jax.random.PRNGKey(0), SPEC)
    static = TaskStatic.from_config(cfg, SPEC, PeftConfig(method=method))
    task = TrainTask(cfg, static, clip_params, eval_chunk=16)
    return cfg, static, task


def test_mesh_and_param_specs():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params = init_clip_params(jax.random.PRNGKey(0), SPEC)
    specs = clip_param_specs(params)
    from jax.sharding import PartitionSpec as P

    flat = jax.tree_util.tree_leaves_with_path(specs)
    spec_by_path = {"/".join(str(k) for k in kp): s for kp, s in flat}
    in_proj = [s for p, s in spec_by_path.items() if "in_proj" in p and "kernel" in p]
    assert all(s == P(None, None, "model") for s in in_proj)


def test_sharded_step_matches_unsharded():
    cfg, static, task = _setup()
    trainable, frozen, bn = task.init_bundle(jax.random.PRNGKey(1))

    n = 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (n,), dtype=np.int64).astype(np.int32))

    epoch = build_epoch_fn(static, n, task.preproc)
    opt_init, _ = make_optimizer("sgd")

    def run(frozen_in, images_in, labels_in, trainable_in, bn_in):
        state = (trainable_in, opt_init(trainable_in), bn_in, jax.random.PRNGKey(2))
        out = jax.jit(epoch)(frozen_in, images_in, labels_in, state, jnp.float32(0.01), jnp.float32(1e-4))
        return jax.tree.map(np.asarray, out[0])

    base = run(frozen, images, labels, trainable, bn)

    mesh = make_mesh(n_data=4, n_model=2)
    with mesh:
        frozen_s = {
            "clip": shard_params(frozen["clip"], mesh),
            "peft": frozen["peft"],
            "head": replicate(frozen["head"], mesh),
        }
        sharded = run(
            frozen_s,
            shard_batch(images, mesh),
            shard_batch(labels, mesh),
            replicate(trainable, mesh),
            replicate(bn, mesh),
        )

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(base), jax.tree_util.tree_leaves_with_path(sharded)
    ):
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=1e-5, err_msg=str(pa))


def test_vmapped_trials_on_mesh():
    """Trial-parallel training under a data-sharded mesh still works."""
    cfg, static, task = _setup("lora")
    n = 32
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 4, (n,), dtype=np.int64).astype(np.int32))
    mesh = make_mesh(n_data=8, n_model=1)
    with mesh:
        res = task.train_trials(
            [(0.01, 1e-4), (0.001, 1e-2)], images, labels, images, labels, end_epoch=2, seed=0
        )
    assert all(np.isfinite(r["best_score"]) for r in res)


def test_trial_parallel_sweep_matches_single_device():
    """8 sweep trials sharded over the 8-device mesh == unsharded trials.

    Trials are data-independent, so the trial axis shards as pure SPMD
    (no collectives) — N chips run N of the reference's sequential sweep
    trainings concurrently (kadaptation_clip.py:188-243)."""
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.TPU.USE_PALLAS_ATTENTION = False

    tiny = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
        text=TextSpec(context_length=8, vocab_size=64, width=32, heads=2, layers=2, output_dim=32),
    )
    clip_params = init_clip_params(jax.random.PRNGKey(0), tiny)
    static = TaskStatic.from_config(cfg, tiny, PeftConfig(method="lora"))

    rng = np.random.default_rng(0)
    base = np.array([[220, 40, 40], [40, 220, 40], [40, 40, 220], [200, 200, 40]], np.float32)
    ty = rng.integers(0, 4, 48)
    tx = np.clip(base[ty][:, None, None, :] + rng.normal(0, 25, (48, 32, 32, 3)), 0, 255).astype(np.uint8)
    vy = rng.integers(0, 4, 16)
    vx = np.clip(base[vy][:, None, None, :] + rng.normal(0, 25, (16, 32, 32, 3)), 0, 255).astype(np.uint8)

    hparams = [(10 ** e, 10 ** w) for e, w in
               [(-2, -4), (-3, -2), (-2, -5), (-2, -2), (-4, -3), (-3, -4), (-2, -3), (-3, -5)]]

    assert len(jax.devices()) >= 8, "conftest must force 8 virtual CPU devices"

    # ONE epoch: sharded == unsharded to float tolerance.  (Partitioning
    # changes per-device GEMM shapes — 8-trial batched vs 1-trial — giving
    # ~1e-5 fp32 diffs that longer chaotic tiny-model training amplifies;
    # that nondeterminism is inherent, same as the reference's CUDA runs.)
    cfg.TPU.SWEEP_TRIALS_OVER_MESH = True
    task_mesh = TrainTask(cfg, static, clip_params, eval_chunk=16)
    assert task_mesh.max_parallel_trials() == cfg.TPU.SWEEP_PARALLEL_TRIALS * len(jax.devices())
    res_mesh = task_mesh.train_trials(hparams, tx, ty, jnp.asarray(vx), jnp.asarray(vy),
                                      end_epoch=1, seed=0, keep_logits=True)
    trained_mesh = jax.tree.map(np.asarray, task_mesh._last_state[0])

    cfg.TPU.SWEEP_TRIALS_OVER_MESH = False
    task_one = TrainTask(cfg, static, clip_params, eval_chunk=16)
    assert task_one.max_parallel_trials() == cfg.TPU.SWEEP_PARALLEL_TRIALS
    res_one = task_one.train_trials(hparams, tx, ty, jnp.asarray(vx), jnp.asarray(vy),
                                    end_epoch=1, seed=0, keep_logits=True)
    trained_one = jax.tree.map(np.asarray, task_one._last_state[0])

    for t, (a, b) in enumerate(zip(res_mesh, res_one)):
        assert a["best_score"] == pytest.approx(b["best_score"], abs=1e-3), (t, a, b)
        np.testing.assert_allclose(a["best_logits"], b["best_logits"], atol=2e-3,
                                   err_msg=f"trial {t} probs diverge under trial sharding")
    for am, ao in zip(jax.tree.leaves(trained_mesh), jax.tree.leaves(trained_one)):
        np.testing.assert_allclose(am, ao, atol=1e-3)

    # multi-epoch sharded run: executes and stays finite (quality covered by
    # the 1-epoch equivalence above)
    cfg.TPU.SWEEP_TRIALS_OVER_MESH = True
    task3 = TrainTask(cfg, static, clip_params, eval_chunk=16)
    res3 = task3.train_trials(hparams[:8], tx, ty, jnp.asarray(vx), jnp.asarray(vy),
                              end_epoch=3, seed=0)
    assert all(np.isfinite(r["best_score"]) for r in res3)


def test_single_trial_final_run_batch_dp():
    """The 1-trial FINAL run batch-DP-shards over the mesh (TPU.MESH_DATA).

    The sweep's trial axis can't help a single trial; trainer._mesh_plan
    instead puts all devices on a "data" axis and constrains each gathered
    batch to it, so the 50-epoch final run — the wall-clock-dominant block —
    uses the whole mesh.  DP result == unsharded result to fp32
    reduction-order tolerance (partitioned batch sums re-associate adds,
    so bitwise equality is impossible by construction).

    Sizes deliberately DON'T divide the batch/chunk: n_train=44 = 2x16 + a
    natural tail step of 12, n_val=17 = one chunk of 16 + a natural eval
    tail of 1 — the r4 natural-size tails run REPLICATED (they rarely
    divide the mesh axis, trainer.run_step/eval_all), and this pins that
    the mixed sharded-full-steps + replicated-tail program still equals
    the unsharded run."""
    cfg, static, task = _setup("kadaptation")

    rng = np.random.default_rng(5)
    tx = rng.integers(0, 255, (44, 32, 32, 3), dtype=np.uint8)
    ty = rng.integers(0, 4, (44,)).astype(np.int32)
    vx, vy = jnp.asarray(tx[:17]), jnp.asarray(ty[:17])

    def run(mesh_data):
        cfg.TPU.MESH_DATA = mesh_data
        t = TrainTask(cfg, static, task.clip_params, eval_chunk=16)
        _, n_t, n_d = t._mesh_plan(1)
        res = t.train_trials([(1e-2, 1e-4)], tx, ty, vx, vy, end_epoch=2, seed=0,
                             keep_logits=True)
        trained = jax.tree.map(lambda a: np.asarray(a[0]), t._last_state[0])
        return (n_t, n_d), res[0], trained

    plan_dp, res_dp, trained_dp = run(-1)
    plan_off, res_off, trained_off = run(1)
    assert plan_dp == (1, 8), plan_dp   # zero-flag default engages the mesh
    assert plan_off == (1, 1), plan_off # MESH_DATA=1 disables it
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(trained_dp),
        jax.tree_util.tree_leaves_with_path(trained_off),
    ):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6, err_msg=str(pa))
    np.testing.assert_allclose(res_dp["best_logits"], res_off["best_logits"], atol=1e-5)
    assert res_dp["best_score"] == pytest.approx(res_off["best_score"], abs=1e-6)


def test_mesh_model_tensor_parallel_matches():
    """TPU.MESH_MODEL=2 engages Megatron TP on the frozen CLIP tree inside
    train_trials (a (trial=1, data=4, model=2) mesh here): result equals the
    unsharded run to fp32 reduction-order tolerance."""
    cfg, static, task = _setup("lora")

    rng = np.random.default_rng(9)
    tx = rng.integers(0, 255, (32, 32, 32, 3), dtype=np.uint8)
    ty = rng.integers(0, 4, (32,)).astype(np.int32)
    vx, vy = jnp.asarray(tx[:16]), jnp.asarray(ty[:16])

    def run(n_model, mesh_data):
        cfg.TPU.MESH_MODEL = n_model
        cfg.TPU.MESH_DATA = mesh_data
        t = TrainTask(cfg, static, task.clip_params, eval_chunk=16)
        mesh, n_t, n_d = t._mesh_plan(1)
        res = t.train_trials([(1e-2, 1e-4)], tx, ty, vx, vy, end_epoch=2, seed=0)
        trained = jax.tree.map(lambda a: np.asarray(a[0]), t._last_state[0])
        n_m = mesh.shape.get("model", 1) if mesh is not None else 1
        return (n_t, n_d, n_m), res[0], trained

    plan_tp, res_tp, trained_tp = run(2, -1)
    plan_off, res_off, trained_off = run(1, 1)
    assert plan_tp == (1, 4, 2), plan_tp
    assert plan_off == (1, 1, 1), plan_off
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(trained_tp),
        jax.tree_util.tree_leaves_with_path(trained_off),
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-6, err_msg=str(pa))
    assert np.isfinite(res_tp["best_score"])
