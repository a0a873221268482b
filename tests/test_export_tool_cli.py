"""End-to-end: train via the CLI, checkpoint, export a serving artifact
with tools/export_model.py, replay it, and match the library forward.

Covers the production hand-off chain the reference never had:
  CLI training -> Orbax trainable checkpoint -> restore in the export tool
  -> program-only StableHLO artifact -> exp.call(weights, images).
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = Path(__file__).resolve().parents[1]

from tests.test_cli_e2e import _argv, _write_cfgs  # same tiny-config grammar


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "export_model", REPO / "tools" / "export_model.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_train_checkpoint_export_replay(tmp_path):
    from pevit_tpu.commands.kronecker_adaptation_clip import main as train_main

    ds, model = _write_cfgs(tmp_path)
    ck = str(tmp_path / "ck")
    best_acc, _ = train_main(_argv(ds, model, extra=["TPU.CHECKPOINT_DIR", ck]))
    assert best_acc > 0 and (Path(ck)).exists()

    out = tmp_path / "clf.stablehlo"
    tool = _load_tool()
    exported = tool.main([
        "--model", model, "--ds", ds, "--method", "kadaptation",
        "--ckpt-dir", ck, "--weights-as-args", "--out", str(out),
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert out.stat().st_size > 0
    assert str(exported.in_avals[-1].shape[0]) == "b"  # symbolic batch

    # rebuild the serving weights the way a deployment host would: fresh
    # init (different seed values) + the TRAINED state restored on top —
    # the artifact must reproduce the tool's model, not the fresh init
    from pevit_tpu.ckpt import load_clip, restore_trainable
    from pevit_tpu.config import get_default_config, update_config
    from pevit_tpu.core.clip import CLIPSpec
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.serve import load_exported, make_serving_fn, serving_weights
    from pevit_tpu.train import TaskStatic, TrainTask

    class _A:  # the tool's own config grammar
        opts = ["TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
                "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False"]

    cfg = get_default_config()
    for f in (ds, model):
        _A.cfg = f
        update_config(cfg, _A)
    clip_params, spec = load_clip("ViT-B/32", checkpoint_path=None, seed=0,
                                  spec_hint=CLIPSpec.from_config(cfg))
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="kadaptation"))
    task = TrainTask(cfg, static, clip_params)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(0))
    trainable = restore_trainable(ck, trainable)

    serve = make_serving_fn(static, trainable, frozen, bn_state, task.preproc)
    weights = serving_weights(trainable, frozen, bn_state)
    loaded = load_exported(out)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 255, (3, 32, 32, 3), dtype=np.uint8))
    np.testing.assert_allclose(
        np.asarray(loaded.call(weights, x)), np.asarray(serve(x)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.slow
def test_mesh_export_flag(tmp_path):
    """--mesh N authors a GSPMD data-parallel artifact (nr_devices == N)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices (conftest forces 8 virtual CPUs)")

    ds, model = _write_cfgs(tmp_path)
    out = tmp_path / "clf_mesh.stablehlo"
    tool = _load_tool()
    exported = tool.main([
        "--model", model, "--ds", ds, "--method", "kadaptation",
        "--weights-as-args", "--mesh", "4", "--out", str(out),
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert exported.nr_devices == 4
    from pevit_tpu.serve import load_exported

    assert load_exported(out).nr_devices == 4
    # symbolic batch constrained to multiples of the mesh width
    assert str(exported.in_avals[-1].shape[0]) == "4*b"


def test_mesh_export_flag_too_few_devices(tmp_path):
    ds, model = _write_cfgs(tmp_path)
    tool = _load_tool()
    with pytest.raises(SystemExit, match="visible devices"):
        tool.main([
            "--model", model, "--ds", ds, "--mesh", "999",
            "--out", str(tmp_path / "x.stablehlo"),
        ])


@pytest.mark.slow
def test_serve_bench_smoke(tmp_path, capsys):
    """tools/serve_bench.py runs both arms and reports throughput JSON."""
    import json as _json

    ds, model = _write_cfgs(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "serve_bench", REPO / "tools" / "serve_bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    results = mod.main([
        "--model", model, "--ds", ds, "--batch", "2", "--images", "4",
        "--reps", "1", "--depths", "2",
        "TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
        "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
    ])
    assert set(results) == {"naive", "pipe2"}
    assert all(v and v[0] > 0 for v in results.values())
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert {_json.loads(l)["arm"] for l in lines} == {"naive", "pipe2"}


@pytest.mark.slow
def test_zeroshot_export_text_head(tmp_path):
    """TRAIN.INIT_HEAD_WITH_TEXT_ENCODER at export time = a zero-shot
    classifier artifact in one command (no training, no checkpoint) —
    serving twin of the reference's linear_probe --emulate-zeroshot."""
    _, model = _write_cfgs(tmp_path)
    ds = "resources/datasets/cifar10.yaml"  # real class names/templates
    flags = ["--model", model, "--ds", str(ds), "--method", "linear_probe",
             "--weights-as-args"]
    kv = ["TRAIN.IMAGE_SIZE", "[32,32]", "TEST.IMAGE_SIZE", "[32,32]",
          "TPU.COMPUTE_DTYPE", "float32", "TPU.USE_PALLAS_ATTENTION", "False",
          "DATASET.ROOT", str(tmp_path / "none"), "MODEL.PRETRAINED", "random"]
    tool = _load_tool()
    zs = tool.main(flags + ["--out", str(tmp_path / "zs.stablehlo")]
                   + kv + ["TRAIN.INIT_HEAD_WITH_TEXT_ENCODER", "True"])

    # expected: the SAME task built in-process with the text-feature head
    from pevit_tpu.ckpt import load_clip
    from pevit_tpu.config import get_default_config, update_config
    from pevit_tpu.core.clip import CLIPSpec
    from pevit_tpu.evaluation.text_features import extract_text_features
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.serve import make_serving_fn, serving_weights
    from pevit_tpu.train import TaskStatic, TrainTask

    class _A:
        opts = kv + ["TRAIN.INIT_HEAD_WITH_TEXT_ENCODER", "True"]

    cfg = get_default_config()
    for f in (str(ds), model):
        _A.cfg = f
        update_config(cfg, _A)
    clip_params, spec = load_clip("ViT-B/32", checkpoint_path=None, seed=0,
                                  spec_hint=CLIPSpec.from_config(cfg))
    tw = extract_text_features(cfg, clip_params, spec)
    assert tw.shape[1] == 10  # (embed_dim, K)
    static = TaskStatic.from_config(cfg, spec, PeftConfig(method="linear_probe"))
    task = TrainTask(cfg, static, clip_params, text_init_weights=tw)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(0))
    serve = make_serving_fn(static, trainable, frozen, bn_state, task.preproc)
    weights = serving_weights(trainable, frozen, bn_state)

    x = jnp.asarray(np.random.default_rng(1).integers(0, 255, (4, 32, 32, 3),
                                                      dtype=np.uint8))
    np.testing.assert_allclose(
        np.asarray(zs.call(weights, x)), np.asarray(serve(x)),
        rtol=1e-5, atol=1e-5,
    )
    # the text init actually bit: a bundle built WITHOUT it disagrees
    # (program-only artifacts carry the head in the bundle, not the program)
    task_rnd = TrainTask(cfg, static, clip_params)
    tr2, fr2, bn2 = task_rnd.init_bundle(jax.random.PRNGKey(0))
    assert not np.allclose(
        np.asarray(zs.call(serving_weights(tr2, fr2, bn2), x)),
        np.asarray(serve(x)), atol=1e-3)

    # and the DEPLOYMENT path honours the flag: serving_loader rebuilds the
    # text-initialised bundle from the artifact + config alone
    from pevit_tpu.serving_loader import load_serving_callable

    call, img_size = load_serving_callable(
        artifact=str(tmp_path / "zs.stablehlo"), config=cfg,
        method="linear_probe", verbose=False)
    assert img_size == 32
    np.testing.assert_allclose(
        np.asarray(call(x)), np.asarray(serve(x)), rtol=1e-5, atol=1e-5)


def test_serving_loader_zero_classes_fails_loudly():
    """A config with no class count (no --ds) must not build an empty-head
    classifier (r4 bug: fresh-export serve_bench with only --model produced
    (N, 0) logits and crashed downstream)."""
    import pytest

    from pevit_tpu.config import get_default_config
    from pevit_tpu.serving_loader import load_serving_callable

    cfg = get_default_config()
    assert cfg.DATASET.NUM_CLASSES == 0
    with pytest.raises(ValueError, match="NUM_CLASSES"):
        load_serving_callable(config=cfg, verbose=False)


def test_serve_bench_defaults_num_classes(monkeypatch, capsys):
    """serve_bench fills a 100-class head when no dataset YAML pins one
    (the documented fresh-export command has no --ds)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import importlib

    sb = importlib.import_module("serve_bench")

    captured = {}

    def fake_load(**kw):
        captured["config"] = kw["config"]
        raise SystemExit(0)  # stop before any device work

    monkeypatch.setattr("pevit_tpu.serving_loader.load_serving_callable", fake_load)
    with __import__("pytest").raises(SystemExit):
        sb.main(["--model", "resources/model/vitb32_CLIP.yaml",
                 "MODEL.PRETRAINED", "random"])
    assert captured["config"].DATASET.NUM_CLASSES == 100


@pytest.mark.slow
def test_swin_backbone_export_replay(tmp_path):
    """A factory (swin) backbone exports through the same tool and the
    artifact replays against the library forward — the serving surface is
    not CLIP-tower-only.  Uses a nano clip_swin (2-stage Swin vision tower
    incl. a res==window clamped stage + 2-layer text tower) with the
    deterministic random init, program-only weights."""
    from pevit_tpu.config import get_default_config, update_config
    from pevit_tpu.models import get_model
    from pevit_tpu.peft import PeftConfig
    from pevit_tpu.serve import load_exported, make_serving_fn, serving_weights
    from pevit_tpu.train import TaskStatic, TrainTask
    from pevit_tpu.core.clip import CLIPSpec

    model = tmp_path / "nano_clip_swin.yaml"
    model.write_text(
        "MODEL:\n"
        "  NAME: clip_swin_nano\n"
        "  PRETRAINED: ''\n"
        "  SPEC:\n"
        "    EMBED_DIM: 64\n"
        "    TEXT:\n"
        "      TOKENIZER: clip\n"
        "      CONTEXT_LENGTH: 77\n"
        "      WIDTH: 64\n"
        "      HEADS: 2\n"
        "      LAYERS: 2\n"
        "    VISION:\n"
        "      PATCH_SIZE: 4\n"
        "      IN_CHANS: 3\n"
        "      EMBED_DIM: 32\n"
        "      DEPTHS: [2, 2]\n"
        "      NUM_HEADS: [2, 4]\n"
        "      WINDOW_SIZE: 7\n"
        "      MLP_RATIO: 4.\n"
        "      QKV_BIAS: True\n"
        "      APE: False\n"
        "      PATCH_NORM: True\n"
        "      DROP_RATE: 0.0\n"
        "TEST:\n"
        "  MODEL_FILE: ''\n"
    )
    ds = tmp_path / "ds.yaml"
    ds.write_text(
        "DATASET:\n  DATASET: 'cifar-10'\n  ROOT: '%s'\n  NUM_CLASSES: 10\n"
        "  ALLOW_SYNTHETIC: True\n" % str(tmp_path / "data")
    )
    opts = ["TRAIN.IMAGE_SIZE", "[56,56]", "TEST.IMAGE_SIZE", "[56,56]",
            "TPU.COMPUTE_DTYPE", "float32"]

    out = tmp_path / "swin.stablehlo"
    tool = _load_tool()
    exported = tool.main([
        "--model", str(model), "--ds", str(ds), "--method", "linear_probe",
        "--weights-as-args", "--out", str(out), *opts,
    ])
    assert out.stat().st_size > 0
    # vision tower: 56/4 = 14 -> stage1 res 7 == window (the clamped case)

    # rebuild the identical serving state in-process (same config + seed)
    class _A:
        pass

    _A.opts = list(opts)

    cfg = get_default_config()
    for f in (str(ds), str(model)):
        _A.cfg = f
        update_config(cfg, _A)
    bb = get_model(cfg)
    static = TaskStatic.from_config(
        cfg, CLIPSpec.from_config(cfg), PeftConfig(method="linear_probe"),
        feat_dim=bb.feat_dim,
    )
    task = TrainTask(cfg, static, None, backbone=bb)
    trainable, frozen, bn_state = task.init_bundle(jax.random.PRNGKey(0))
    serve = make_serving_fn(static, trainable, frozen, bn_state, task.preproc,
                            forward_fn=task._forward_fn)
    weights = serving_weights(trainable, frozen, bn_state)
    loaded = load_exported(out)
    x = jnp.asarray(np.random.default_rng(7).integers(0, 255, (3, 56, 56, 3), dtype=np.uint8))
    np.testing.assert_allclose(
        np.asarray(loaded.call(weights, x)), np.asarray(serve(x)),
        rtol=1e-5, atol=1e-5,
    )
