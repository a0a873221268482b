"""InferencePipeline: the host-side serving driver (pevit_tpu/serve.py).

Covers logit correctness against the plain serving fn (ragged sizes, order,
splitting past max_batch), the bounded-compile bucket contract, artifact
integration, and argument validation.  The reference has no serving runtime
(SURVEY.md §5.4) — this is a beyond-reference component.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pevit_tpu.serve import InferencePipeline, export_classifier, make_serving_fn

from .test_serve_export import RES, _images, _tiny_task


@pytest.fixture(scope="module")
def served():
    static, trainable, frozen, bn_state, preproc = _tiny_task()
    return make_serving_fn(static, trainable, frozen, bn_state, preproc)


def test_ragged_stream_matches_direct(served):
    pipe = InferencePipeline(served, max_batch=8, min_bucket=2, depth=3)
    sizes = [3, 17, 5, 1, 8]
    batches = [np.asarray(_images(n)) for n in sizes]
    outs = pipe.run(batches)
    assert [o.shape for o in outs] == [(n, 4) for n in sizes]
    for imgs, got in zip(batches, outs):
        np.testing.assert_allclose(
            got, np.asarray(served(jnp.asarray(imgs)), np.float32), rtol=1e-5, atol=1e-5
        )
    assert pipe.stats["images"] == sum(sizes)
    assert pipe.throughput > 0


def test_bucketing_bounds_distinct_shapes(served):
    seen = set()

    def counting(x):
        seen.add(x.shape[0])
        return served(x)

    pipe = InferencePipeline(counting, max_batch=8, min_bucket=4)
    pipe.run([_images(n) for n in range(1, 9)])
    # sizes 1..8 collapse onto exactly the {4, 8} buckets
    assert seen == {4, 8}


def test_single_array_call(served):
    pipe = InferencePipeline(served, max_batch=4, min_bucket=4)
    imgs = np.asarray(_images(10))  # 4 + 4 + 2(padded to 4)
    got = pipe(imgs)
    np.testing.assert_allclose(
        got, np.asarray(served(jnp.asarray(imgs)), np.float32), rtol=1e-5, atol=1e-5
    )


def test_exported_artifact_through_pipeline(served, tmp_path):
    from pevit_tpu.serve import load_exported, save_exported

    static, trainable, frozen, bn_state, preproc = _tiny_task()
    exp = export_classifier(static, trainable, frozen, bn_state, preproc, image_size=RES)
    save_exported(exp, tmp_path / "clf.stablehlo")
    loaded = load_exported(tmp_path / "clf.stablehlo")

    pipe = InferencePipeline(loaded.call, max_batch=8, min_bucket=8)
    got = pipe(np.asarray(_images(11)))
    np.testing.assert_allclose(
        got, np.asarray(served(_images(11)), np.float32), rtol=1e-5, atol=1e-5
    )


def test_mesh_artifact_through_pipeline(served):
    """GSPMD serving artifact driven by the pipeline with a sharded place_fn."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (conftest forces 8 virtual CPUs)")
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    static, trainable, frozen, bn_state, preproc = _tiny_task()
    from pevit_tpu.serve import serving_weights

    exp = export_classifier(
        static, trainable, frozen, bn_state, preproc,
        image_size=RES, bake_weights=False, mesh=mesh,
    )
    weights = jax.device_put(
        serving_weights(trainable, frozen, bn_state), NamedSharding(mesh, PartitionSpec())
    )
    img_sh = NamedSharding(mesh, PartitionSpec("data", None, None, None))
    pipe = InferencePipeline(
        lambda x: exp.call(weights, x),
        max_batch=16, min_bucket=4,  # multiples of the mesh width
        place_fn=lambda x: jax.device_put(x, img_sh),
    )
    got = pipe(np.asarray(_images(22)))  # 16 + 6->pad 8
    np.testing.assert_allclose(
        got, np.asarray(served(_images(22)), np.float32), rtol=1e-5, atol=1e-5
    )


def test_validation():
    with pytest.raises(ValueError):
        InferencePipeline(lambda x: x, depth=0)
    with pytest.raises(ValueError):
        InferencePipeline(lambda x: x, max_batch=4, min_bucket=8)
    with pytest.raises(ValueError):
        InferencePipeline(lambda x: x, pad_policy="pad")


def test_exact_pad_policy_never_pads(served):
    seen = []

    def counting(x):
        seen.append(x.shape[0])
        return served(x)

    pipe = InferencePipeline(counting, max_batch=8, min_bucket=4, pad_policy="exact")
    sizes = [3, 17, 5, 1]
    outs = pipe.run([_images(n) for n in sizes])
    # chunks run at NATURAL size: 17 splits at max_batch into 8 + 8 + 1
    assert seen == [3, 8, 8, 1, 5, 1]
    assert [o.shape[0] for o in outs] == sizes


def test_exact_pad_policy_is_composition_safe():
    """A deliberately batch-composition-sensitive fn (subtracts the batch
    mean — a stand-in for the PEFT raw-reshape scramble): bucket padding
    perturbs the real rows' outputs, pad_policy='exact' reproduces the
    natural-size evaluation bit-for-bit."""

    def fn(x):
        x = jnp.asarray(x, jnp.float32).reshape(x.shape[0], -1)[:, :4]
        return x - x.mean(axis=0, keepdims=True)

    imgs = np.asarray(_images(3))
    direct = np.asarray(fn(imgs), np.float32)

    padded = InferencePipeline(fn, max_batch=8, min_bucket=8)(imgs)
    assert np.abs(padded - direct).max() > 1e-3  # zero-pad rows shift the mean

    exact = InferencePipeline(fn, max_batch=8, min_bucket=8, pad_policy="exact")(imgs)
    np.testing.assert_array_equal(exact, direct)
