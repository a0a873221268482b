"""Serving export: jax.export round-trip of the eval forward.

The artifact must reproduce the library forward bit-for-bit, serve multiple
batch sizes through ONE symbolic-batch export, and survive
serialize -> deserialize with no Python model code rebuilt.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pevit_tpu.config import get_default_config
from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
from pevit_tpu.peft import PeftConfig
from pevit_tpu.serve import (
    export_classifier,
    load_exported,
    make_serving_fn,
    save_exported,
    serving_weights,
)
from pevit_tpu.train import TaskStatic, TrainTask

RES = 32
TINY = CLIPSpec(
    embed_dim=32,
    vision=VisionSpec(input_resolution=RES, patch_size=16, width=64, layers=2, heads=2, output_dim=32),
    text=TextSpec(context_length=12, vocab_size=100, width=32, heads=2, layers=2, output_dim=32),
)


def _tiny_task(method="kadaptation"):
    cfg = get_default_config()
    cfg.defrost()
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    clip_params = init_clip_params(jax.random.PRNGKey(0), TINY)
    static = TaskStatic.from_config(cfg, TINY, PeftConfig(method=method))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    return static, trainable, frozen, bn_state, task.preproc


def _images(batch):
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.integers(0, 255, (batch, RES, RES, 3), dtype=np.uint8))


def test_symbolic_batch_roundtrip(tmp_path):
    static, trainable, frozen, bn_state, preproc = _tiny_task()
    serve = make_serving_fn(static, trainable, frozen, bn_state, preproc)
    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc, image_size=RES
    )
    path = tmp_path / "clf.stablehlo"
    save_exported(exp, path)
    assert path.stat().st_size > 0
    loaded = load_exported(path)

    for batch in (2, 5):  # ONE artifact, multiple batch sizes
        x = _images(batch)
        got = np.asarray(loaded.call(x))
        want = np.asarray(serve(x))
        assert got.shape == (batch, 4)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_weights_as_args_roundtrip(tmp_path):
    """Program-only artifact + separate weight bundle (hot-swap mode)."""
    static, trainable, frozen, bn_state, preproc = _tiny_task()
    serve = make_serving_fn(static, trainable, frozen, bn_state, preproc)
    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc,
        image_size=RES, bake_weights=False,
    )
    path = tmp_path / "clf_args.stablehlo"
    save_exported(exp, path)
    loaded = load_exported(path)
    weights = serving_weights(trainable, frozen, bn_state)
    x = _images(3)
    np.testing.assert_allclose(
        np.asarray(loaded.call(weights, x)), np.asarray(serve(x)),
        rtol=1e-5, atol=1e-5,
    )
    # the program-only artifact must be tiny compared to the baked one:
    # weights live OUTSIDE it (hot-swappable)
    baked = export_classifier(
        static, trainable, frozen, bn_state, preproc, image_size=RES
    )
    assert path.stat().st_size < len(baked.serialize()) / 2


def test_data_parallel_mesh_export(tmp_path):
    """GSPMD serving artifact: weights replicated, batch sharded on 'data'."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (conftest forces 8 virtual CPUs)")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    static, trainable, frozen, bn_state, preproc = _tiny_task()
    serve = make_serving_fn(static, trainable, frozen, bn_state, preproc)
    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc,
        image_size=RES, bake_weights=False, mesh=mesh,
    )
    assert exp.nr_devices == 4
    path = tmp_path / "clf_dp.stablehlo"
    save_exported(exp, path)
    loaded = load_exported(path)

    weights = jax.device_put(
        serving_weights(trainable, frozen, bn_state),
        NamedSharding(mesh, PartitionSpec()),
    )
    img_sh = NamedSharding(mesh, PartitionSpec("data", None, None, None))
    for batch in (8, 16):  # multiples of the mesh's data width
        x = jax.device_put(_images(batch), img_sh)
        got = np.asarray(loaded.call(weights, x))
        np.testing.assert_allclose(
            got, np.asarray(serve(_images(batch))), rtol=1e-5, atol=1e-5
        )


def test_aux_backbone_export(tmp_path):
    """forward_fn path: a factory (non-CLIP) backbone exports and replays."""
    from pevit_tpu.models import get_model

    cfg = get_default_config()
    cfg.defrost()
    cfg.MODEL.NAME = "cls_example"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [RES, RES]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.freeze()
    backbone = get_model(cfg)
    static = TaskStatic.from_config(
        cfg, TINY, PeftConfig(method="linear_probe"), feat_dim=backbone.feat_dim
    )
    task = TrainTask(cfg, static, backbone.params, backbone=backbone)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(1))
    fwd = task._forward_fn
    assert fwd is not None

    serve = make_serving_fn(static, trainable, frozen, bn_state, task.preproc, forward_fn=fwd)
    exp = export_classifier(
        static, trainable, frozen, bn_state, task.preproc,
        image_size=RES, bake_weights=False, forward_fn=fwd,
    )
    path = tmp_path / "aux.stablehlo"
    save_exported(exp, path)
    weights = serving_weights(trainable, frozen, bn_state)
    x = _images(3)
    np.testing.assert_allclose(
        np.asarray(load_exported(path).call(weights, x)), np.asarray(serve(x)),
        rtol=1e-5, atol=1e-5,
    )


def test_static_batch_export():
    static, trainable, frozen, bn_state, preproc = _tiny_task(method="lora")
    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc,
        image_size=RES, dynamic_batch=False,
    )
    out = np.asarray(exp.call(_images(1)))
    assert out.shape == (1, 4) and np.all(np.isfinite(out))
    # a static export must reject other batch sizes rather than mis-serve
    with pytest.raises(Exception):
        exp.call(_images(3))


def test_quantized_mesh_export(tmp_path):
    """int8 weight bundle + GSPMD data-parallel program in one artifact:
    the small-push serving-pod deployment (quantized bundle replicated,
    batch sharded)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (conftest forces 8 virtual CPUs)")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    static, trainable, frozen, bn_state, preproc = _tiny_task()
    serve = make_serving_fn(static, trainable, frozen, bn_state, preproc,
                            quantize=True)
    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc,
        image_size=RES, bake_weights=False, mesh=mesh, quantize=True,
    )
    assert exp.nr_devices == 4
    loaded = load_exported(save_exported(exp, tmp_path / "q_dp.stablehlo")
                           or tmp_path / "q_dp.stablehlo")

    weights = jax.device_put(
        serving_weights(trainable, frozen, bn_state, quantize=True),
        NamedSharding(mesh, PartitionSpec()),
    )
    img_sh = NamedSharding(mesh, PartitionSpec("data", None, None, None))
    x = jax.device_put(_images(8), img_sh)
    np.testing.assert_allclose(
        np.asarray(loaded.call(weights, x)),
        np.asarray(serve(_images(8))), rtol=1e-5, atol=1e-5,
    )
