"""Multi-process (multi-host) worker — launched by test_multihost.py.

Runs under ``jax.distributed.initialize`` with 2 CPU processes x 2 virtual
devices each (the offline analogue of 2 TPU hosts on one slice).  Exercises
the code path SURVEY.md §5.8 names as the TPU-native replacement for the
reference's torch.distributed comm backend (vision_benchmark/utils/
comm.py:12-65), which before round 4 had never executed:

1. ``pevit_tpu.utils.dist.initialize()`` (dist.py:25-39) from env vars,
2. cross-process psum / all_gather_object / reduce_dict,
3. ONE sharded training epoch (trainer.build_epoch_fn with the batch
   constrained to a cross-process "data" axis) whose trainable update
   matches the single-process unsharded run.

Prints MULTIHOST_OK on success; any assertion kills the process (the parent
test asserts rc==0 for both ranks).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")

    from pevit_tpu.utils import dist

    dist.initialize()

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()
    assert pid == int(os.environ["JAX_PROCESS_ID"]), (pid, os.environ["JAX_PROCESS_ID"])
    assert dist.world_size() == 2 and dist.rank() == pid
    assert dist.is_main_process() == (pid == 0)

    devs = jax.devices()
    assert len(devs) == 4, devs  # 2 local x 2 processes
    assert len(jax.local_devices()) == 2

    # --- cross-process collectives -------------------------------------
    mesh = Mesh(np.array(devs), ("data",))
    sh = NamedSharding(mesh, P("data"))
    local = (np.arange(2, dtype=np.float32) + 10.0 * pid)  # p0: [0,1]  p1: [10,11]
    g = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
    total_host = np.asarray(total.addressable_data(0))
    assert float(total_host) == 22.0, total_host

    gathered = dist.all_gather_object(np.float32(pid + 1))
    assert sorted(np.asarray(gathered).ravel().tolist()) == [1.0, 2.0], gathered

    red = dist.reduce_dict({"loss": float(pid + 1)}, average=True)
    assert abs(red["loss"] - 1.5) < 1e-6, red

    # --- one sharded epoch == single-process epoch ----------------------
    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.train.optim import make_optimizer
    from pevit_tpu.train.trainer import build_epoch_fn

    spec = CLIPSpec(
        embed_dim=32,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=64, layers=1,
                          heads=2, output_dim=32),
        text=TextSpec(context_length=8, vocab_size=64, width=32, heads=1,
                      layers=1, output_dim=32),
    )
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TEST.METRIC = "accuracy"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.REMAT = False
    cfg.TPU.USE_PALLAS_ATTENTION = False

    clip_params = init_clip_params(jax.random.PRNGKey(0), spec)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="lora"))
    task = TrainTask(cfg, static, clip_params, eval_chunk=8)
    trainable, frozen, bn = task.init_bundle(jax.random.PRNGKey(1))

    n = 16
    rng = np.random.default_rng(0)  # same seed on both processes
    images = rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (n,)).astype(np.int32)

    opt_init, _ = make_optimizer("sgd")

    def run(batch_sharding):
        ep = build_epoch_fn(static, n, task.preproc, batch_sharding=batch_sharding)
        if batch_sharding is None:
            frozen_in, tr_in, bn_in = frozen, trainable, bn
            imgs, labs = jnp.asarray(images), jnp.asarray(labels)
            rng_in = jax.random.PRNGKey(2)
        else:
            # replicate everything globally; the epoch fn constrains each
            # gathered batch to the cross-process data axis
            repl = lambda t: multihost_utils.host_local_array_to_global_array(t, mesh, P())
            frozen_in, tr_in, bn_in = repl(frozen), repl(trainable), repl(bn)
            imgs, labs = repl(images), repl(labels)
            rng_in = repl(np.asarray(jax.random.PRNGKey(2)))
        state = (tr_in, opt_init(tr_in), bn_in, rng_in)
        out = jax.jit(ep)(frozen_in, imgs, labs, state, jnp.float32(0.01), jnp.float32(1e-4))
        return jax.tree.map(lambda a: np.asarray(a.addressable_data(0)), out[0])

    base = run(None)
    shard = run(NamedSharding(mesh, P("data")))
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(base),
        jax.tree_util.tree_leaves_with_path(shard),
    ):
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=str(path))

    multihost_utils.sync_global_devices("done")
    print("MULTIHOST_OK", pid, flush=True)


if __name__ == "__main__":
    sys.exit(main())
