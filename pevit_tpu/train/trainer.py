"""The task trainer: jitted whole-epoch training with vmapped trial batches.

TPU-native redesign of the reference epoch loop (kadaptation_clip.py:257-417).
Key departures from the torch step-at-a-time design, none of which change the
math:

* The ENTIRE epoch runs inside one jitted ``lax.fori_loop`` over steps; the
  (few-shot) train split lives on device as uint8, normalisation is fused
  into the forward pass, and batches are gathered from a per-epoch
  ``jax.random.permutation`` — no host<->device ping-pong in the hot loop.
* Partial final batches run at their NATURAL size as a separately-traced
  step (r4 fix): padding + masking is not reference-equivalent because the
  PEFT towers' raw-reshape scramble mixes batch rows (measured O(1) logit
  deltas), so tail batches get the same small-batch CE/BCE means and
  BatchNorm statistics torch computes; size-1 batches are skipped entirely
  (kadaptation_clip.py:342, full_model_finetune.py:311).
* A batch of hyperparameter trials trains SIMULTANEOUSLY via ``vmap`` over
  (trainable params, optimiser state, bn state, rng, lr, wd) with the frozen
  backbone broadcast — the reference's ~90 sequential sweep trainings per
  (dataset, seed) become a handful of vmapped stages (see sweep.py).
* Gradients exist only for the trainable partition (see partition.py).

Epoch-boundary behaviour mirrors the reference exactly: step-decay LR by
milestone (``adjust_learning_rate``), validation after every epoch keeping
the best epoch's logits (kadaptation_clip.py:291-304), optional
EMULATE_ZERO_SHOT skip, SEARCH_RESULT_ON_LAST_EPOCH.
"""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.clip import CLIPSpec, encode_image
from ..evaluation.metrics import get_metric
from ..peft.base import (
    PEFT_METHODS,
    PeftConfig,
    init_peft,
    make_hooks,
    peft_trainable_filter,
)
from .head import head_forward, init_bn_state, init_head
from .optim import make_optimizer, step_decay_lr
from .partition import combine, count_params, partition


@dataclasses.dataclass(frozen=True)
class TaskStatic:
    """Hashable static configuration threaded through jit."""

    spec: CLIPSpec
    peft_cfg: PeftConfig
    num_classes: int
    batch_size: int = 64
    use_bn: bool = True
    normalize_feature: bool = False
    apply_logit_scale: bool = False
    trainable_logit_scale: bool = False
    multilabel: bool = False
    compute_dtype: str = "bfloat16"
    remat: str = "none"  # "none" | "full" | "dots" (see core.clip._run_blocks)
    use_pallas: bool = False
    use_fused_mlp: bool = False  # fused LN2->MLP->residual Pallas kernel (frozen-MLP methods only; ops/fused_mlp.py)
    optimizer: str = "sgd"
    momentum: float = 0.9
    nesterov: bool = False
    emulate_zero_shot: bool = False
    highest_precision: bool = False
    clip_grad_norm: float = 0.0
    two_lr: bool = False
    without_wd: tuple = ()  # TRAIN.WITHOUT_WD_LIST (optim/build.py:18-85)
    timm_filter: bool = False  # timm create_optimizer filter_bias_and_bn
    fast_ln: bool = False
    fold_ln2: bool = False  # TPU.FOLD_LN2: ln_2 affine folded into c_fc (core/layers.py)
    scan_unroll: int = 0  # layer-loop unroll: 0 full (measured +10%/+24% b32/b16), 1 rolled (core/clip.py)
    kadapt_concat_delta: bool = False  # TPU.KADAPT_CONCAT_DELTA: one x@[H_q|H_v] GEMM per layer (peft/kadaptation.py)
    step_unroll: int = 1  # step-loop unroll: 1 fori_loop (default), k>1 scan(unroll=k) over steps
    attn_layout: str = "auto"  # mask-free attention layout: auto = bhnd iff N<=64 (core/layers.py); parity pins bnhd
    merge_encoder_head_proj: bool = False
    feat_dim: int = 0  # 0 => spec.embed_dim (classifier-head input width)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def head_dim(self) -> int:
        if self.feat_dim:
            return self.feat_dim
        if self.merge_encoder_head_proj:
            return self.spec.vision.width
        return self.spec.embed_dim

    @staticmethod
    def from_config(config, spec: CLIPSpec, peft_cfg: PeftConfig, feat_dim: int = 0) -> "TaskStatic":
        opt_name, opt_momentum, opt_nesterov, opt_timm_filter = _resolve_optimizer(config)
        return TaskStatic(
            spec=spec,
            peft_cfg=peft_cfg,
            num_classes=config.DATASET.NUM_CLASSES,
            batch_size=config.TRAIN.BATCH_SIZE_PER_GPU,
            use_bn=config.TRAIN.USE_CHANNEL_BN,
            normalize_feature=config.TRAIN.NORMALIZE_VISUAL_FEATURE,
            apply_logit_scale=peft_cfg.method in ("linear_probe", "full_finetune"),
            trainable_logit_scale=config.TRAIN.TRAINABLE_LOGIT_SCALE,
            multilabel=config.DATASET.DATASET in {"voc-2007-classification", "chestx-ray8"},
            compute_dtype="float32" if (config.TPU.PARITY_FP32 or config.MODEL.CLIP_FP32) else config.TPU.COMPUTE_DTYPE,
            remat={False: "none", True: "full"}.get(config.TPU.REMAT, str(config.TPU.REMAT)),
            use_pallas=config.TPU.USE_PALLAS_ATTENTION,
            # dgrad-only VJP => the MLP weights must be frozen: every method
            # except full_finetune (see ops/fused_mlp.py frozen-weight note)
            use_fused_mlp=bool(config.TPU.get("FUSED_MLP", False))
            and peft_cfg.method != "full_finetune",
            optimizer=opt_name,
            momentum=opt_momentum,
            nesterov=opt_nesterov,
            without_wd=tuple(config.TRAIN.WITHOUT_WD_LIST or ()),
            timm_filter=opt_timm_filter,
            emulate_zero_shot=config.TRAIN.EMULATE_ZERO_SHOT,
            highest_precision=config.TPU.PARITY_FP32,
            clip_grad_norm=config.TRAIN.CLIP_GRAD_NORM,
            two_lr=config.TRAIN.TWO_LR,
            fast_ln=config.TPU.FAST_LN and not config.TPU.PARITY_FP32,
            # full_finetune trains the visual tower: the fold would change the
            # parametrization the optimizer sees, so it is forced off there
            fold_ln2=bool(config.TPU.get("FOLD_LN2", False))
            and not config.TPU.PARITY_FP32
            and peft_cfg.method != "full_finetune",
            scan_unroll=int(config.TPU.get("SCAN_UNROLL", 0)),
            kadapt_concat_delta=bool(config.TPU.get("KADAPT_CONCAT_DELTA", False)),
            step_unroll=int(config.TPU.get("STEP_UNROLL", 1)),
            # bhnd is a bf16-throughput feature (core/layers.py); fp32 compute
            # means a parity/accuracy context, which keeps the reference-shaped
            # bnhd computation.  (Also: the bhnd trace is not vmap-stable at
            # float level — vmapped trials round differently from a lone trial,
            # which the fp32 trainer-equality tests would trip over.)
            attn_layout=("bnhd" if (
                config.TPU.PARITY_FP32
                or config.MODEL.CLIP_FP32
                or str(config.TPU.COMPUTE_DTYPE) == "float32"
            ) else str(config.TPU.get("ATTN_LAYOUT", "auto"))),
            merge_encoder_head_proj=config.TRAIN.MERGE_ENCODER_AND_HEAD_PROJ,
            feat_dim=feat_dim,
        )


def _resolve_optimizer(config) -> tuple:
    """(name, momentum, nesterov, timm_filter) from TRAIN.OPTIMIZER.

    TRAIN.OPTIMIZER='timm' routes through TRAIN.OPTIMIZER_ARGS the way the
    reference hands the args namespace to timm.create_optimizer
    (optim/build.py:89-95; lr is taken from TRAIN.LR — config/default.py:267).
    timm semantics honoured: 'sgd'/'nesterov' enable Nesterov momentum,
    'momentum' is plain SGD, and filter_bias_and_bn defaults on (no decay for
    rank<=1 params).
    """
    name = str(config.TRAIN.OPTIMIZER).lower()
    if name != "timm":
        return name, config.TRAIN.MOMENTUM, config.TRAIN.NESTEROV, False
    args = dict(config.TRAIN.OPTIMIZER_ARGS or {})
    args = {str(k).lower(): v for k, v in args.items()}
    opt = str(args.get("opt", "sgd")).lower()
    momentum = float(args.get("momentum", config.TRAIN.MOMENTUM))
    table = {
        "sgd": ("sgd", True),
        "nesterov": ("sgd", True),
        "momentum": ("sgd", False),
        "adam": ("adam", False),
        "adamw": ("adamw", False),
        "rmsprop": ("rmsprop", False),
        "rmsproptf": ("rmsprop", False),
    }
    if opt not in table:
        raise ValueError(f"Unsupported timm optimizer: {opt!r}")
    mapped, nesterov = table[opt]
    filter_bn = bool(args.get("filter_bias_and_bn", True))
    return mapped, momentum, nesterov, filter_bn


def trainable_pred(static: TaskStatic):
    """Bundle-path trainability (reference parity; see partition.py)."""
    method = static.peft_cfg.method
    peft_filter = peft_trainable_filter(static.peft_cfg)

    def pred(path: tuple) -> bool:
        top = path[0]
        if top == "head":
            if len(path) > 1 and path[1] == "logit_scale":
                return static.trainable_logit_scale
            return True
        if top == "peft":
            return method in PEFT_METHODS and peft_filter(path[1:])
        if top == "clip":
            if method != "full_finetune":
                return False
            # CLIP: visual tower only (text + logit_scale stay frozen,
            # kadaptation_clip.py:104-116); generic backbones train fully
            if len(path) > 1 and path[1] in ("text", "logit_scale"):
                return False
            return True
        return False

    return pred


# ---------------------------------------------------------------------------
# Forward + loss
# ---------------------------------------------------------------------------

def model_forward(
    static: TaskStatic,
    bundle: dict,
    bn_state: dict,
    images_u8: jax.Array,
    preproc: dict,
    *,
    train: bool,
    rng: Optional[jax.Array],
    mask: Optional[jax.Array],
    forward_fn=None,
):
    """uint8 images -> logits.  Normalisation is fused on-device.

    ``images_u8`` is either (B, H, W, 3) raw uint8, or — CLIP-tower fast
    path — (B, G*G, p*p*3) pre-patchified uint8 (core.clip.patchify_images),
    in which case normalisation folds into the patch-embedding GEMM.

    ``forward_fn(params, x_float, train, rng) -> feats`` overrides the CLIP
    visual tower (auxiliary backbones via models.factory;
    MERGE_ENCODER_AND_HEAD_PROJ).  ``rng`` feeds train-time stochasticity
    (e.g. Swin drop-path) and is None at eval.
    """
    dt = static.dtype
    if images_u8.ndim == 3:
        assert forward_fn is None, "pre-patchified input requires the CLIP tower"
        hooks = make_hooks(static.peft_cfg, static.spec, train=train)
        feats = encode_image(
            bundle["clip"],
            images_u8,
            spec=static.spec,
            peft=bundle.get("peft"),
            hooks=hooks,
            rng=rng,
            compute_dtype=dt,
            remat=(static.remat if train else False),
            use_pallas=static.use_pallas,
            use_fused_mlp=static.use_fused_mlp,
            apply_proj=not static.merge_encoder_head_proj,
            patch_fold=(preproc["mean"], preproc["std"]),
        )
    elif forward_fn is not None:
        x = images_u8.astype(dt) / jnp.asarray(255.0, dt)
        x = (x - preproc["mean"].astype(dt)) / preproc["std"].astype(dt)
        feats = forward_fn(bundle["clip"], x, train, rng)
    else:
        x = images_u8.astype(dt) / jnp.asarray(255.0, dt)
        x = (x - preproc["mean"].astype(dt)) / preproc["std"].astype(dt)
        hooks = make_hooks(static.peft_cfg, static.spec, train=train)
        feats = encode_image(
            bundle["clip"],
            x,
            spec=static.spec,
            peft=bundle.get("peft"),
            hooks=hooks,
            rng=rng,
            compute_dtype=dt,
            remat=(static.remat if train else False),
            use_pallas=static.use_pallas,
            use_fused_mlp=static.use_fused_mlp,
            apply_proj=not static.merge_encoder_head_proj,
        )
    logits, bn_state = head_forward(
        bundle["head"],
        bn_state,
        feats.astype(jnp.float32),
        train=train,
        mask=mask,
        use_bn=static.use_bn,
        normalize_feature=static.normalize_feature,
        apply_logit_scale=static.apply_logit_scale,
    )
    return logits, bn_state


def _loss(static: TaskStatic, logits, labels, mask):
    """Masked-mean CE (or BCE for multilabel; kadaptation_clip.py:273-276)."""
    if static.multilabel:
        per = jnp.mean(
            jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits))),
            axis=-1,
        )
    else:
        logz = jax.nn.logsumexp(logits, axis=-1)
        per = logz - jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(per * mask) / count


# ---------------------------------------------------------------------------
# Jitted epoch / eval builders
# ---------------------------------------------------------------------------

def build_epoch_fn(static: TaskStatic, n_train: int, preproc: dict, lr_scales=None, forward_fn=None, wd_mask=None, batch_sharding=None):
    """One full training epoch as a single XLA computation.

    Returns ``epoch(frozen, images, labels, state, lr, wd) -> state``
    where state = (trainable, opt_state, bn_state, rng).  ``preproc``
    (CLIP mean/std) is baked in as a compile-time constant; ``lr_scales``
    implements TRAIN.TWO_LR per-leaf LR multipliers.

    ``batch_sharding`` (a NamedSharding over a "data" mesh axis) constrains
    each gathered batch so the forward/backward partitions over the mesh —
    batch data-parallelism with XLA-inserted gradient/BN-stat all-reduces
    (SURVEY.md §2.9 DP row; the reference's idle utils/comm.py scaffolding).
    The dataset itself stays replicated (few-shot splits are small; large
    splits take the streaming path, which shards each transferred batch).
    """
    B = static.batch_size
    _, opt_update = make_optimizer(
        static.optimizer,
        momentum=static.momentum,
        nesterov=static.nesterov,
        lr_scales=lr_scales,
        wd_mask=wd_mask,
    )
    from .optim import clip_grad_norm as _clip

    def loss_fn(trainable, frozen, bn_state, imgs, labels, mask, rng):
        bundle = combine(trainable, frozen)
        logits, new_bn = model_forward(
            static, bundle, bn_state, imgs, preproc, train=True, rng=rng, mask=mask,
            forward_fn=forward_fn,
        )
        return _loss(static, logits, labels, mask), new_bn

    def epoch(frozen, images, labels, state, lr, wd):
        trainable, opt_state, bn_state, rng = state
        rng, perm_rng, drop_rng = jax.random.split(rng, 3)
        perm = jax.random.permutation(perm_rng, n_train)

        def run_step(carry, idx, step_i, bsz):
            trainable, opt_state, bn_state = carry
            imgs = jnp.take(images, idx, axis=0)
            labs = jnp.take(labels, idx, axis=0)
            if batch_sharding is not None and bsz == B:
                # the natural tail keeps its own (replicated) layout: an
                # uneven remainder generally doesn't divide the mesh axis
                imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
                labs = jax.lax.with_sharding_constraint(labs, batch_sharding)
            step_rng = jax.random.fold_in(drop_rng, step_i)
            valid = jnp.ones((bsz,), jnp.float32)
            (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, frozen, bn_state, imgs, labs, valid, step_rng
            )
            if static.clip_grad_norm > 0:  # full_model_finetune.py:327-328
                grads = _clip(grads, static.clip_grad_norm)
            new_trainable, new_opt = opt_update(grads, trainable, opt_state, lr, wd)
            return new_trainable, new_opt, new_bn

        def step(i, carry):
            return run_step(carry, perm[i * B + jnp.arange(B)], i, B)

        # Tail batches run at their NATURAL size as a separately-traced step
        # (shape still static: n_train and B are Python ints).  Padding +
        # masking is NOT reference-equivalent here: the PEFT towers'
        # raw-reshape scramble (quirk #4, lora_model.py:724-733) mixes batch
        # and token axes, so a padded row changes the REAL rows' outputs —
        # measured O(1) logit deltas vs the natural-size batch.  The
        # reference skips only size-1 tails (full_model_finetune.py:311);
        # both resolve at trace time, no lax.cond on the hot path.
        steps_full = n_train // B
        tail = n_train - steps_full * B
        carry0 = (trainable, opt_state, bn_state)
        if static.step_unroll > 1:
            # scan(unroll=k): k step bodies per loop iteration lets XLA fuse
            # across adjacent step boundaries (cf. the layer-loop unroll win).
            def scan_body(carry, i):
                return step(i, carry), None

            carry0, _ = jax.lax.scan(
                scan_body, carry0, jnp.arange(steps_full), unroll=static.step_unroll
            )
        else:
            carry0 = jax.lax.fori_loop(0, steps_full, step, carry0)
        if tail > 1:
            carry0 = run_step(
                carry0, perm[steps_full * B + jnp.arange(tail)], steps_full, tail
            )
        trainable, opt_state, bn_state = carry0
        return trainable, opt_state, bn_state, rng

    return epoch


def build_fit_fn(static: TaskStatic, n_train: int, n_epochs: int, preproc: dict, lr_scales=None, forward_fn=None, wd_mask=None, batch_sharding=None):
    """``n_epochs`` of training as ONE XLA computation (one device dispatch).

    On this TPU's high-latency link, per-epoch dispatch costs real time; the
    fit function runs the whole (epochs x steps) grid in a single jit.  The
    per-epoch LR comes from a precomputed ``lr_table`` argument (step-decay
    schedule resolved on host), preserving reference semantics.
    """
    epoch = build_epoch_fn(static, n_train, preproc, lr_scales, forward_fn, wd_mask, batch_sharding)

    def fit(frozen, images, labels, state, lr_table, wd):
        def body(e, state):
            return epoch(frozen, images, labels, state, lr_table[e], wd)

        return jax.lax.fori_loop(0, n_epochs, body, state)

    return fit


def build_eval_fn(static: TaskStatic, preproc: dict, forward_fn=None, batch_sharding=None):
    """Chunked, jit-friendly eval forward: returns fp32 logits for a chunk."""

    def eval_chunk(frozen, trainable, bn_state, imgs):
        if batch_sharding is not None:
            imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
        bundle = combine(trainable, frozen)
        logits, _ = model_forward(
            static, bundle, bn_state, imgs, preproc, train=False, rng=None, mask=None,
            forward_fn=forward_fn,
        )
        return logits.astype(jnp.float32)

    return eval_chunk


def build_fit_eval_fn(
    static: TaskStatic,
    n_train: int,
    n_epochs: int,
    preproc: dict,
    *,
    eval_chunk: int,
    n_val: int,
    lr_scales=None,
    forward_fn=None,
    wd_mask=None,
    batch_sharding=None,
):
    """Train ``n_epochs`` AND evaluate after every epoch, in ONE dispatch.

    The reference validates after each epoch to keep the best epoch's logits
    (kadaptation_clip.py:291-304).  Doing that loop host-side costs 2 device
    round trips per epoch on this TPU's high-latency link; here the whole
    (epoch -> eval) ladder runs in-graph and returns the stacked per-epoch
    validation logits (n_epochs, n_val, C) for host-side metric selection —
    one dispatch per (vmapped) trial batch for an entire training run.

    ``val_images`` arrives at its NATURAL size ``n_val``; full chunks of
    ``eval_chunk`` run under ``lax.map`` and the remainder runs as a
    separately-traced natural-size chunk.  No padding: the PEFT towers'
    raw-reshape scramble mixes batch rows, so zero-padding a chunk would
    change the REAL rows' logits (same r4 finding as the train tail).
    """
    epoch = build_epoch_fn(static, n_train, preproc, lr_scales, forward_fn, wd_mask, batch_sharding)

    def fit_eval(frozen, images, labels, val_images, state, lr_table, wd):
        def eval_all(trainable, bn_state):
            def one_chunk(imgs, shard=True):
                if batch_sharding is not None and shard:
                    imgs = jax.lax.with_sharding_constraint(imgs, batch_sharding)
                bundle = combine(trainable, frozen)
                logits, _ = model_forward(
                    static, bundle, bn_state, imgs, preproc, train=False, rng=None, mask=None,
                    forward_fn=forward_fn,
                )
                return logits.astype(jnp.float32)

            n_full = n_val // eval_chunk
            tail = n_val - n_full * eval_chunk
            outs = []
            if n_full:
                chunks = val_images[: n_full * eval_chunk].reshape(
                    n_full, eval_chunk, *val_images.shape[1:]
                )
                outs.append(
                    jax.lax.map(one_chunk, chunks).reshape(
                        n_full * eval_chunk, static.num_classes
                    )
                )
            if tail:  # natural-size remainder (replicated: it rarely divides the mesh)
                outs.append(one_chunk(val_images[n_full * eval_chunk :], shard=False))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs)

        def body(state, lr_e):
            if static.emulate_zero_shot:
                new_state = state
            else:
                new_state = epoch(frozen, images, labels, state, lr_e, wd)
            logits = eval_all(new_state[0], new_state[2])
            return new_state, logits

        state, logits_all = jax.lax.scan(body, state, lr_table)
        return state, logits_all  # logits_all: (n_epochs, n_val, C)

    return fit_eval


# ---------------------------------------------------------------------------
# Host-side orchestration
# ---------------------------------------------------------------------------

class TrainTask:
    """Owns the frozen backbone + data on device; runs (batched) trainings.

    The reference rebuilds the full model per sweep trial
    (kadaptation_clip.py:260); here the frozen CLIP weights are transferred
    once and shared by every trial, and trial batches execute under vmap.
    """

    def __init__(
        self,
        config,
        static: TaskStatic,
        clip_params: dict,
        *,
        text_init_weights: Optional[np.ndarray] = None,
        # None = method-dependent default.  For lora/kadaptation the
        # raw-reshape scramble makes logits depend on batch COMPOSITION
        # (measured: lora 2.19 / kadapt 3e-3 max row delta, batch 8 vs 4),
        # so eval chunking is semantics and must match the reference's
        # val/test dataloader batch of 64 (feature.py:76,101).  The
        # adapter/compacter/probe/finetune towers are row-independent
        # (measured exactly 0.0 delta), so they keep the fast 512 chunks.
        eval_chunk: Optional[int] = None,
        backbone=None,
    ):
        self.config = config
        self.static = static
        if eval_chunk is None:
            eval_chunk = 64 if static.peft_cfg.method in ("lora", "kadaptation") else 512
        self.backbone = backbone  # models.factory.Backbone for non-CLIP towers
        if backbone is not None:
            clip_params = backbone.params
            if backbone.forward_features_train is not None:
                # train-time stochasticity (Swin drop-path) needs the step rng
                self._forward_fn = lambda p, x, train, rng=None: (
                    backbone.forward_features_train(p, x, rng)
                    if train
                    else backbone.forward_features(p, x)
                )
            else:
                self._forward_fn = lambda p, x, train, rng=None: backbone.forward_features(p, x)
        else:
            self._forward_fn = None
        if static.fold_ln2 and backbone is None \
                and static.peft_cfg.method != "full_finetune":
            # full_finetune trains the visual tower — folding would change
            # the parametrization the optimizer sees, so it stays unfolded
            # one-time ln_2-affine fold into the frozen c_fc GEMMs (exact
            # algebra + idempotent — core.clip.fold_ln2_params); the per-step
            # trace-time switch (core/layers.py) then skips the dead affine
            from ..core.clip import fold_ln2_params

            clip_params = fold_ln2_params(clip_params)
        self.clip_params = clip_params
        self.text_init_weights = text_init_weights
        self.eval_chunk = eval_chunk
        self.metric = get_metric(config.TEST.METRIC or "accuracy")
        self.metric_name = getattr(self.metric, "__name__", "accuracy")
        self._epoch_cache: dict = {}
        self._eval_cache: dict = {}
        self._apply_fast_ln()
        opt_init, _ = make_optimizer(
            static.optimizer, momentum=static.momentum, nesterov=static.nesterov
        )
        self._opt_init = opt_init
        mean = np.asarray(config.INPUT.MEAN, np.float32)
        std = np.asarray(config.INPUT.STD, np.float32)
        self.preproc = {"mean": jnp.asarray(mean), "std": jnp.asarray(std)}
        self._prepack_jit = None

    def _apply_fast_ln(self):
        """Set the trace-time LN switch to THIS task's flavour.

        Called at the top of every train/eval entry point (not just __init__)
        so two tasks with different ``fast_ln`` can interleave — the
        sweep-only FAST_LN scheme (sweep.py) runs trial stages on a
        fast-LN clone while the final run keeps the reference's fp32 LN
        islands (model.py:154-160).  The global only matters while TRACING;
        each task's jit cache entries were traced under its own flag.
        Also applies this task's layer-loop unroll (core/clip.py)."""
        from ..core.clip import set_scan_unroll
        from ..core.layers import set_attn_layout, set_fast_ln, set_fold_ln2
        from ..peft.kadaptation import set_concat_delta

        set_fast_ln(self.static.fast_ln)
        set_fold_ln2(self.static.fold_ln2)
        set_scan_unroll(self.static.scan_unroll)
        set_attn_layout(self.static.attn_layout)
        set_concat_delta(self.static.kadapt_concat_delta)

    def clone_with(self, **static_overrides) -> "TrainTask":
        """A task sharing this one's (device-resident) weights and head init
        but with a modified TaskStatic (fresh jit caches)."""
        static = dataclasses.replace(self.static, **static_overrides)
        return TrainTask(
            self.config, static, self.clip_params,
            text_init_weights=self.text_init_weights,
            eval_chunk=self.eval_chunk, backbone=self.backbone,
        )

    # -- fast input path ------------------------------------------------------

    @property
    def use_prepack(self) -> bool:
        """Pre-patchified uint8 fast path (core.clip.patchify_images).

        On whenever training drives the CLIP ViT tower; off for PARITY_FP32
        (keeps the reference's normalise-then-patchify op order bit-stable),
        for non-CLIP backbones, and for RN towers (both need NHWC images)."""
        return (
            self._forward_fn is None
            and not self.static.highest_precision
            and self.static.spec.vision_rn is None
        )

    def prepack(self, images):
        """Device-put images, pre-patchified when the fast path applies.

        Idempotent: already-packed (N, G*G, p*p*3) arrays pass through, as do
        NHWC arrays when the fast path is off.  All data entering train/eval
        goes through here so the preloaded and streaming paths see identical
        numerics."""
        if isinstance(images, np.ndarray):
            images = jnp.asarray(images)
        if not self.use_prepack or images.ndim != 4:
            return images
        p = self.static.spec.vision.patch_size
        if images.shape[1] % p or images.shape[2] % p:
            return images
        if self._prepack_jit is None:
            from ..core.clip import patchify_images

            # NOTE: do NOT pin the output layout.  The fit jit re-copies the
            # packed dataset to its preferred layout on entry (~156 ms/
            # dispatch at B/32:1024 imgs, 25% of a 2-epoch window's device
            # time — profiled r2).  Pinning this program's output to the
            # canonical (0,1,2) layout the fit asks for WORKS mechanically,
            # but the fit jit keys its compile on argument layouts and the
            # program XLA builds for a (0,1,2) entry measured 1837 img/s vs
            # 3225 at B/32:128 (r2 A/B) — the entry copy is cheaper than the
            # relayouts that version runs per epoch.  See ARCHITECTURE.md
            # perf notes; AUTO negotiation on the fit side is the remaining
            # avenue.
            self._prepack_jit = jax.jit(patchify_images, static_argnums=(1,))
        return self._prepack_jit(images, p)

    # -- bundle construction ------------------------------------------------

    def init_bundle(self, rng: jax.Array) -> tuple:
        """Build (trainable, frozen, bn_state) for ONE trial."""
        k_peft, k_head = jax.random.split(rng)
        st = self.static
        peft = init_peft(k_peft, st.peft_cfg, st.spec) if self.backbone is None else None
        backbone_ls = float(self.clip_params.get("logit_scale", math.log(1 / 0.07))) \
            if isinstance(self.clip_params, dict) and "logit_scale" in self.clip_params \
            else math.log(1 / 0.07)

        text_weights = self.text_init_weights
        if text_weights is not None and st.merge_encoder_head_proj:
            # fold the visual projection into the head kernel
            # (kadaptation_clip.py:146-158): kernel(width,K) = proj @ zs(E,K)
            proj = np.asarray(self.clip_params["visual"]["proj"], np.float32)
            text_weights = proj @ np.asarray(text_weights, np.float32)

        head = init_head(
            k_head,
            st.head_dim,
            st.num_classes,
            text_init_weights=text_weights,
            logit_scale_init=self.config.TRAIN.LOGIT_SCALE_INIT,
            backbone_logit_scale=backbone_ls,
        )
        bundle = {"clip": self.clip_params, "peft": peft, "head": head}
        trainable, frozen = partition(bundle, trainable_pred(st))
        bn_state = init_bn_state(st.head_dim)
        return trainable, frozen, bn_state

    def model_info(self, trainable) -> dict:
        """Parameter statistics (kadaptation_clip.py:284-289 semantics)."""
        st = self.static
        clip_n = count_params(self.clip_params)
        visual_n = count_params(
            self.clip_params.get("visual", self.clip_params)
            if isinstance(self.clip_params, dict)
            else self.clip_params
        )
        from ..peft.base import peft_num_params

        peft_n = peft_num_params(st.peft_cfg, st.spec) if self.backbone is None else 0
        head_n = st.head_dim * st.num_classes + st.num_classes
        return {
            "n_trainable_params": count_params(trainable),
            "n_visual_params": visual_n + peft_n,
            "n_backbone_params": clip_n + peft_n,
            "n_params": clip_n + peft_n + head_n + 1,  # +1 classifier logit_scale
        }

    # -- jit caches ----------------------------------------------------------

    def _lr_scales(self):
        """TRAIN.TWO_LR per-leaf multipliers: backbone-module params (clip +
        peft) at 0.1x, head at 1x (reference optim/build.py:100-117)."""
        if not self.static.two_lr:
            return None
        trainable, _, _ = self.init_bundle(jax.random.PRNGKey(0))

        def scale(kp, leaf):
            top = kp[0].key if hasattr(kp[0], "key") else str(kp[0])
            return 0.1 if str(top) in ("clip", "peft") else 1.0

        return jax.tree_util.tree_map_with_path(scale, trainable)

    def _wd_mask(self):
        """TRAIN.WITHOUT_WD_LIST / timm filter_bias_and_bn per-leaf wd
        multipliers (reference optim/build.py:18-85)."""
        if not self.static.without_wd and not self.static.timm_filter:
            return None
        from .optim import build_wd_mask

        trainable, _, _ = self.init_bundle(jax.random.PRNGKey(0))
        mask = build_wd_mask(trainable, self.static.without_wd, timm_filter=self.static.timm_filter)
        if self.config.VERBOSE:
            # reference optim/build.py:55-74 logs the no-decay params when
            # cfg.VERBOSE; same signal here, one line per masked leaf path
            import jax.tree_util as jtu

            for path, m in jtu.tree_leaves_with_path(mask):
                if not m:
                    logging.info("no weight decay: %s", jtu.keystr(path))
        return mask

    def _mesh_plan(self, n_trials: int):
        """(mesh, n_trial, n_data) — the device mesh for this trial batch.

        Trials claim devices first (independent trainings -> pure SPMD, no
        collectives); for a SINGLE trial — the final run and its eval, the
        wall-clock-dominant block (sweep stages are <1 min of a ~5 min
        (dataset, seed) run) — the devices form a "data" axis instead and the
        batch shards across it (TPU.MESH_DATA; reference scaffolding
        utils/comm.py:12-65, LRxworld_size at config/default.py:257).
        TPU.MESH_DATA: -1 auto (all leftover devices), 0/1 off, >1 cap.
        Returns (None, 1, 1) when both axes collapse.
        """
        devs = jax.devices()
        D = len(devs)
        if D <= 1:
            return None, 1, 1
        # tensor-parallel axis (TPU.MESH_MODEL): Megatron col/row specs on the
        # frozen CLIP tree (parallel/mesh.py) — a config knob, not a rewrite.
        # ViT-B fits per chip, so TP stays 1 unless explicitly requested.
        n_m = max(1, int(self.config.TPU.get("MESH_MODEL", 1)))
        if n_m > 1 and (self.backbone is not None or D // n_m < 1):
            n_m = 1
        D_td = D // n_m
        n_t = 1
        if bool(self.config.TPU.get("SWEEP_TRIALS_OVER_MESH", True)) and n_trials > 1:
            n_t = min(D_td, n_trials)
            while n_t > 1 and n_trials % n_t:
                n_t -= 1
        md = int(self.config.TPU.get("MESH_DATA", -1))
        if md >= 0 and md <= 1:
            n_d = 1
        elif n_trials == 1 or md > 1:
            # auto mode engages batch-DP for the single-trial final run/eval;
            # MESH_DATA>1 additionally allows a (trial x data) hybrid
            n_d = D_td // n_t if md < 0 else min(D_td // n_t, md)
        else:
            n_d = 1
        # at least 2 examples per shard, or the per-device GEMMs degenerate
        n_d = min(n_d, max(1, self.static.batch_size // 2))
        if n_t == 1 and n_d == 1 and n_m == 1:
            return None, 1, 1
        from jax.sharding import Mesh

        mesh = Mesh(
            np.asarray(devs[: n_t * n_d * n_m]).reshape(n_t, n_d, n_m),
            ("trial", "data", "model"),
        )
        return mesh, n_t, n_d

    def max_parallel_trials(self) -> int:
        """Per-dispatch trial budget: SWEEP_PARALLEL_TRIALS per device times
        the trial-mesh width (the remote-compiler program-size ceiling that
        motivates the cap is per-device under SPMD)."""
        per_dev = max(1, self.config.TPU.SWEEP_PARALLEL_TRIALS)
        if not bool(self.config.TPU.get("SWEEP_TRIALS_OVER_MESH", True)):
            return per_dev
        return per_dev * max(1, len(jax.devices()))

    def _frozen_axes(self, peft_axis):
        """vmap in_axes prefix for the frozen bundle: the CLIP tower + head
        statics broadcast, the frozen PEFT subtree optionally carries a
        per-trial leading axis (``peft_axis=0``) — see train_trials."""
        if peft_axis is None:
            return None
        return {"clip": None, "peft": peft_axis, "head": None}

    def _epoch_fn(self, n_train: int, n_trials: int, batch_sharding=None, peft_axis=None):
        key = (n_train, n_trials, batch_sharding, peft_axis)
        if key not in self._epoch_cache:
            epoch = build_epoch_fn(self.static, n_train, self.preproc, self._lr_scales(), self._forward_fn, self._wd_mask(), batch_sharding)
            batched = jax.vmap(epoch, in_axes=(self._frozen_axes(peft_axis), None, None, 0, 0, 0))
            self._epoch_cache[key] = jax.jit(batched, donate_argnums=(3,))
        return self._epoch_cache[key]

    def _fit_eval_fn(self, n_train: int, n_epochs: int, n_val: int, n_trials: int, batch_sharding=None, peft_axis=None):
        key = (n_train, n_epochs, n_val, self.eval_chunk, n_trials, batch_sharding, peft_axis)
        if key not in self._epoch_cache:
            fe = build_fit_eval_fn(
                self.static,
                n_train,
                n_epochs,
                self.preproc,
                eval_chunk=self.eval_chunk,
                n_val=n_val,
                lr_scales=self._lr_scales(),
                forward_fn=self._forward_fn,
                wd_mask=self._wd_mask(),
                batch_sharding=batch_sharding,
            )
            batched = jax.vmap(fe, in_axes=(self._frozen_axes(peft_axis), None, None, None, 0, 0, 0))
            self._epoch_cache[key] = jax.jit(batched, donate_argnums=(4,))
        return self._epoch_cache[key]

    def _eval_fn(self, n_trials: int, batch_sharding=None, peft_axis=None):
        key = (n_trials, batch_sharding, peft_axis)
        if key not in self._eval_cache:
            ev = build_eval_fn(self.static, self.preproc, self._forward_fn, batch_sharding)
            batched = jax.vmap(ev, in_axes=(self._frozen_axes(peft_axis), 0, 0, None))
            self._eval_cache[key] = jax.jit(batched)
        return self._eval_cache[key]

    def _batch_sharding(self, mesh, n_d: int):
        """NamedSharding that shards a batch's leading axis on "data"."""
        if mesh is None or n_d <= 1:
            return None
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return NamedSharding(mesh, P("data"))

    # -- evaluation -----------------------------------------------------------

    def evaluate(self, frozen, trainable_stack, bn_stack, images_u8, labels, n_trials: int, *, frozen_peft_axis=None):
        """Eval all trials over the full split; returns (scores, probs list).

        Logits gather chunk-by-chunk (device) -> softmax + metric (host,
        exactly like the reference's sklearn/vision-evaluation path).
        ``frozen_peft_axis=0`` when ``frozen["peft"]`` carries a per-trial
        leading axis (see train_trials).
        """
        self._apply_fast_ln()
        n = labels.shape[0]
        mesh, _, n_d = self._mesh_plan(n_trials)
        ev = self._eval_fn(n_trials, self._batch_sharding(mesh, n_d), frozen_peft_axis)
        chunks = []
        for s in range(0, n, self.eval_chunk):
            e = min(s + self.eval_chunk, n)
            # NATURAL-size chunks (the tail retraces once): zero-padding a
            # chunk changes real rows' logits under the PEFT scramble quirk
            # — see build_fit_eval_fn.  Per-chunk prepack keeps host-resident
            # test splits streaming without a packed device copy.
            imgs = self.prepack(images_u8[s:e])
            chunks.append(np.asarray(ev(frozen, trainable_stack, bn_stack, imgs)))
        logits = np.concatenate(chunks, axis=1)  # (T, n, C)
        labels_np = np.asarray(labels)
        scores, probs_all = [], []
        for t in range(n_trials):
            z = logits[t] - logits[t].max(axis=-1, keepdims=True)
            probs = np.exp(z)
            probs /= probs.sum(axis=-1, keepdims=True)
            try:
                score = 100.0 * self.metric(labels_np, probs)
                if not np.isfinite(score):
                    score = 0.0
            except Exception:  # NaN-prone mAP guard (kadaptation_clip.py:367-371)
                score = 0.0
            scores.append(float(score))
            probs_all.append(probs)
        return scores, probs_all

    def _train_trials_streaming(
        self, hparams, train_images, train_labels, val_images, val_labels, *,
        state, frozen, begin_epoch, end_epoch, seed, keep_logits, log_every, results,
        peft_axis=None,
    ):
        """Host-streaming fallback for HBM-exceeding train splits."""
        from .streaming import StreamingEpochRunner

        T = len(hparams)
        lrs = [h[0] for h in hparams]
        wds = jnp.asarray([h[1] for h in hparams], jnp.float32)
        schedule = list(self.config.TRAIN.SCHEDULE or [])
        runner = StreamingEpochRunner(self, T, peft_axis=peft_axis)
        val_images = self.prepack(val_images)
        logging.info(
            "streaming path: %d train images (%.1f GB) stay host-resident",
            len(train_labels), train_images.nbytes / 1e9,
        )
        for epoch in range(begin_epoch, end_epoch):
            if not self.static.emulate_zero_shot:
                lr_e = jnp.asarray(
                    [step_decay_lr(float(lr), epoch, schedule) for lr in lrs], jnp.float32
                )
                state = runner.run_epoch(
                    frozen, state, train_images, train_labels, lr_e, wds, seed=seed * 1000 + epoch
                )
            scores, probs = self.evaluate(
                frozen, state[0], state[2], val_images, val_labels, T,
                frozen_peft_axis=peft_axis,
            )
            for t in range(T):
                results[t]["last_score"] = scores[t]
                if scores[t] > results[t]["best_score"] or (
                    epoch == begin_epoch and keep_logits and results[t]["best_logits"] is None
                ):
                    if keep_logits:
                        results[t]["best_logits"] = probs[t]
                results[t]["best_score"] = max(results[t]["best_score"], scores[t])
            if log_every and (epoch % log_every == 0 or epoch == end_epoch - 1):
                logging.info(
                    "[Epoch %d] Val %s: %s (streaming)", epoch, self.metric_name,
                    " ".join(f"{s:.3f}" for s in scores),
                )
        self._last_state = state
        self._last_frozen = frozen
        return results

    # -- (batched) training ----------------------------------------------------

    def train_trials(
        self,
        hparams: list,
        train_images,
        train_labels,
        val_images,
        val_labels,
        *,
        end_epoch: int,
        begin_epoch: int = 0,
        seed: int = 0,
        keep_logits: bool = False,
        log_every: int = 0,
    ) -> list:
        """Train ``len(hparams)`` trials simultaneously; hparams = [(lr, wd)].

        Returns per-trial dicts: {"best_score", "last_score", "best_logits"}.
        """
        self._apply_fast_ln()
        st = self.static
        T = len(hparams)
        n_train = int(train_labels.shape[0])

        # per-trial init (distributional parity: fresh init per trial like the
        # reference's per-trial model rebuild).  Frozen-but-random PEFT leaves
        # (compacter's shared phm_rule, U(-1,1) at init and NEVER trained —
        # compacter_model.py:513-514 + the 'compacter' substring freeze) are
        # ALSO redrawn per trial and ride a vmapped axis, exactly like the
        # reference's per-rebuild redraw; only the CLIP tower (identical
        # across rebuilds once real weights load) is shared.
        frozen = None
        frozen_pefts = []
        base_rng = jax.random.PRNGKey(seed)
        trial_rngs = jax.random.split(jax.random.fold_in(base_rng, 17), T)
        trainables, bns = [], []
        for t in range(T):
            trainable, frozen_t, bn_state = self.init_bundle(trial_rngs[t])
            if frozen is None:
                frozen = frozen_t
            frozen_pefts.append(frozen_t["peft"])
            trainables.append(trainable)
            bns.append(bn_state)
        peft_axis = None
        if frozen_pefts[0] is not None and jax.tree.leaves(frozen_pefts[0]):
            peft_axis = 0
            frozen = dict(frozen)
            frozen["peft"] = jax.tree.map(lambda *xs: jnp.stack(xs), *frozen_pefts)
        trainable_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *trainables)
        bn_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *bns)
        # vmapped init: scalar state leaves (AdamState.step) must carry the
        # trial axis too, or the trial-vmap over state rejects rank-0 leaves
        opt_stack = jax.vmap(self._opt_init)(trainable_stack)
        rng_stack = jax.vmap(lambda r: jax.random.fold_in(r, 23))(trial_rngs)

        lrs = np.asarray([h[0] for h in hparams], np.float32)
        wds = np.asarray([h[1] for h in hparams], np.float32)

        results = [
            {"best_score": 0.0, "last_score": 0.0, "best_logits": None} for _ in range(T)
        ]
        state = (trainable_stack, opt_stack, bn_stack, rng_stack)
        n_epochs = end_epoch - begin_epoch
        if n_epochs <= 0:
            self._last_state = state
            self._last_frozen = frozen
            return results

        # datasets too big for HBM stream from host RAM (full-shot
        # patch-camelyon etc.); see train/streaming.py
        max_bytes = float(self.config.TPU.get("MAX_DEVICE_DATA_GB", 4.0)) * 1e9
        if isinstance(train_images, np.ndarray) and train_images.nbytes > max_bytes:
            return self._train_trials_streaming(
                hparams, train_images, train_labels, val_images, val_labels,
                state=state, frozen=frozen, begin_epoch=begin_epoch,
                end_epoch=end_epoch, seed=seed, keep_logits=keep_logits,
                log_every=log_every, results=results, peft_axis=peft_axis,
            )
        train_images = self.prepack(train_images)
        if isinstance(train_labels, np.ndarray):
            train_labels = jnp.asarray(train_labels)
        val_images = self.prepack(val_images)

        # val split ships at its NATURAL size: full eval chunks + a natural
        # remainder (no padding — see build_fit_eval_fn's scramble note)
        n_val = int(val_labels.shape[0])

        schedule = list(self.config.TRAIN.SCHEDULE or [])
        lr_tables = jnp.asarray(
            [
                [step_decay_lr(float(lr), e, schedule) for e in range(begin_epoch, end_epoch)]
                for lr in lrs
            ],
            jnp.float32,
        )

        # --- device mesh ----------------------------------------------------
        # HP-sweep trials are data-independent, so the vmapped trial axis
        # shards across devices as pure SPMD (no collectives): N chips run N
        # sweep trials concurrently.  The reference runs its ~90 trainings
        # strictly sequentially on one GPU (kadaptation_clip.py:188-243).
        # A single trial (the final run) instead shards its BATCH over a
        # "data" axis — classic DP with XLA-inserted grad all-reduces — so
        # the 50-epoch final run uses the whole mesh, not 1/N of it.
        mesh, n_t, n_d = self._mesh_plan(T)
        batch_sharding = self._batch_sharding(mesh, n_d)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            trial_sh = NamedSharding(mesh, P("trial") if n_t > 1 else P())
            repl = NamedSharding(mesh, P())
            put = lambda sh: (lambda x: jax.device_put(x, sh))
            state = jax.tree.map(put(trial_sh), state)
            lr_tables = jax.device_put(lr_tables, trial_sh)
            wds = jax.device_put(jnp.asarray(wds), trial_sh)
            n_m = mesh.shape.get("model", 1)
            if n_m > 1 and self.backbone is None:
                # tensor parallelism: Megatron col/row specs on the frozen
                # CLIP transformer (parallel/mesh.py:33-49); GSPMD inserts
                # the all-reduces
                from ..parallel.mesh import clip_param_specs

                specs = clip_param_specs(frozen["clip"])
                clip_put = jax.tree.map(
                    lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                    frozen["clip"], specs,
                )
            else:
                clip_put = jax.tree.map(put(repl), frozen["clip"])
            frozen = {
                "clip": clip_put,
                "peft": jax.tree.map(
                    put(trial_sh if peft_axis == 0 else repl), frozen["peft"]
                ),
                "head": jax.tree.map(put(repl), frozen["head"]),
            }
            train_images = jax.device_put(train_images, repl)
            train_labels = jax.device_put(train_labels, repl)
            val_images = jax.device_put(val_images, repl)
            logging.info(
                "device mesh: %d trials over (trial=%d, data=%d) of %d devices",
                T, n_t, n_d, len(jax.devices()),
            )

        # the ENTIRE (train -> per-epoch eval) ladder for all trials runs as
        # one device dispatch; metric/selection happens on host afterwards
        # with reference semantics (strict >, best-epoch logits)
        fit_eval = self._fit_eval_fn(n_train, n_epochs, n_val, T, batch_sharding, peft_axis)
        t0 = time.time()
        state, logits_all = fit_eval(
            frozen, train_images, train_labels, val_images, state, lr_tables, jnp.asarray(wds)
        )
        logits_np = np.asarray(logits_all)  # (T, E, n_val, C)
        labels_np = np.asarray(val_labels)
        run_s = time.time() - t0

        for t in range(T):
            for e in range(n_epochs):
                z = logits_np[t, e] - logits_np[t, e].max(axis=-1, keepdims=True)
                probs = np.exp(z)
                probs /= probs.sum(axis=-1, keepdims=True)
                try:
                    score = 100.0 * self.metric(labels_np, probs)
                    if not np.isfinite(score):
                        score = 0.0
                except Exception:  # NaN-prone mAP guard (kadaptation_clip.py:367-371)
                    score = 0.0
                results[t]["last_score"] = float(score)
                if score > results[t]["best_score"] or (
                    e == 0 and keep_logits and results[t]["best_logits"] is None
                ):
                    if keep_logits:
                        results[t]["best_logits"] = probs
                results[t]["best_score"] = max(results[t]["best_score"], float(score))
                if log_every and t == 0 and (e % log_every == 0 or e == n_epochs - 1):
                    logging.info(
                        "[Epoch %d] Val %s: %.3f", begin_epoch + e, self.metric_name, score
                    )
        if log_every:
            logging.info(
                "=> %d trials x %d epochs in %.2fs (device) | best: %s",
                T, n_epochs, run_s,
                " ".join(f"{r['best_score']:.3f}" for r in results),
            )

        self._last_state = state
        self._last_frozen = frozen
        return results
