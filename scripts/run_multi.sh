#!/bin/bash
# Env-driven single-job launcher (reference scripts/run_multi.sh): the
# batch-launch variant of run.sh — DATASET and OUTPUT_DIR come from the
# environment so an external scheduler can fan jobs out.
#
#   DATASET=cifar10 OUTPUT_DIR=/tmp/out scripts/run_multi.sh

############## Configuration section begins ##################

# Model Config: [vitb32_CLIP, vitb16_CLIP, mae_vitb16, mocov3_vitb16, vit_base_patch16_224, vit_base_patch32_224, deit_base_patch16_224]
model_cfg=${MODEL_CFG:-vitb32_CLIP}

# Mode: [linear_probe, finetune, zeroshot]
mode=${MODE:-zeroshot}

# Use FP32 [default: True]
use_fp32=${USE_FP32:-True}

# Dataset: [caltech101]
dataset=$DATASET

# Model checkpoint
model_ckpt=${MODEL_CKPT:-.}

# output directory
output_dir=$OUTPUT_DIR

############ Configurations for hyperparameter tuning begin ############

disable_hyperparameter_tuning=${DISABLE_TUNING:-False}
learning_rate=${LR:-0.1}
l2_weight_decay=${L2:-1e-6}

############ Configurations for linear_probe/finetune begin ############

random_seed=${RANDOM_SEED:-0}
num_shots=${NUM_SHOTS:-5}
init_head_with_text_encoder=${INIT_HEAD:-True}
merge_encoder_and_proj=${MERGE_PROJ:-False}

############ Configurations for adding knowledge begin ############

use_wordnet_hierachy=${USE_WN_HIERARCHY:-False}
use_wordnet_definition=${USE_WN_DEF:-False}
use_wiktionary_definition=${USE_WIKI_DEF:-False}
use_gpt3=${USE_GPT3:-False}
use_gpt3_count=${USE_GPT3_COUNT:-0}

############## Configuration section ends ##################

if [ -z "$dataset" ] || [ -z "$output_dir" ]; then
    echo "run_multi.sh: set DATASET and OUTPUT_DIR in the environment." >&2
    exit 1
fi

cd "$(dirname "$0")/.."

if [ "$mode" = "linear_probe" ]; then
    python -m pevit_tpu.commands.linear_probe --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml --no-tuning $disable_hyperparameter_tuning --lr $learning_rate --l2 $l2_weight_decay MODEL.CLIP_FP32 $use_fp32 DATASET.NUM_SAMPLES_PER_CLASS $num_shots DATASET.ROOT $output_dir/datasets OUTPUT_DIR $output_dir/$model_cfg/log DATASET.RANDOM_SEED_SAMPLING $random_seed TRAIN.FREEZE_IMAGE_BACKBONE True TRAIN.INIT_HEAD_WITH_TEXT_ENCODER $init_head_with_text_encoder TRAIN.MERGE_ENCODER_AND_HEAD_PROJ $merge_encoder_and_proj KNOWLEDGE.WORDNET.USE_HIERARCHY $use_wordnet_hierachy KNOWLEDGE.WORDNET.USE_DEFINITION $use_wordnet_definition KNOWLEDGE.WIKITIONARY.USE_DEFINITION $use_wiktionary_definition KNOWLEDGE.GPT3.USE_GPT3 $use_gpt3 KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS $use_gpt3_count TEST.MODEL_FILE "$model_ckpt" $EXTRA_OPTS
elif [ "$mode" = "finetune" ]; then
    python -m pevit_tpu.commands.finetune --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml --no-tuning $disable_hyperparameter_tuning --lr $learning_rate --l2 $l2_weight_decay MODEL.CLIP_FP32 $use_fp32 DATASET.NUM_SAMPLES_PER_CLASS $num_shots DATASET.ROOT $output_dir/datasets OUTPUT_DIR $output_dir/$model_cfg/log DATASET.RANDOM_SEED_SAMPLING $random_seed TRAIN.INIT_HEAD_WITH_TEXT_ENCODER $init_head_with_text_encoder TRAIN.MERGE_ENCODER_AND_HEAD_PROJ $merge_encoder_and_proj KNOWLEDGE.WORDNET.USE_HIERARCHY $use_wordnet_hierachy KNOWLEDGE.WORDNET.USE_DEFINITION $use_wordnet_definition KNOWLEDGE.WIKITIONARY.USE_DEFINITION $use_wiktionary_definition KNOWLEDGE.GPT3.USE_GPT3 $use_gpt3 KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS $use_gpt3_count TEST.MODEL_FILE "$model_ckpt" $EXTRA_OPTS
elif [ "$mode" = "zeroshot" ]; then
    python -m pevit_tpu.commands.zeroshot --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml MODEL.CLIP_FP32 $use_fp32 DATASET.ROOT $output_dir/datasets OUTPUT_DIR $output_dir/$model_cfg/log KNOWLEDGE.WORDNET.USE_HIERARCHY $use_wordnet_hierachy KNOWLEDGE.WORDNET.USE_DEFINITION $use_wordnet_definition KNOWLEDGE.WIKITIONARY.USE_DEFINITION $use_wiktionary_definition KNOWLEDGE.GPT3.USE_GPT3 $use_gpt3 KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS $use_gpt3_count TEST.MODEL_FILE "$model_ckpt" $EXTRA_OPTS
elif [ "$mode" = "kadaptation" ] || [ "$mode" = "lora" ] || [ "$mode" = "adapter" ] || [ "$mode" = "compacter" ]; then
    # PEFT batch-launch modes (beyond the reference's run_multi surface):
    # same command grammar as scripts/{kadapter,lora,adapter,compacter}_clip.sh
    case "$mode" in
        kadaptation) cmd=kronecker_adaptation_clip ;;
        lora)        cmd=lora_clip ;;
        adapter)     cmd=adapter_clip ;;
        compacter)   cmd=compacter_clip ;;
    esac
    python -m pevit_tpu.commands.$cmd --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml --no-tuning $disable_hyperparameter_tuning --lr $learning_rate --l2 $l2_weight_decay MODEL.CLIP_FP32 $use_fp32 DATASET.NUM_SAMPLES_PER_CLASS $num_shots DATASET.ROOT $output_dir/datasets OUTPUT_DIR $output_dir/$model_cfg/log DATASET.RANDOM_SEED_SAMPLING $random_seed TRAIN.INIT_HEAD_WITH_TEXT_ENCODER $init_head_with_text_encoder TRAIN.MERGE_ENCODER_AND_HEAD_PROJ $merge_encoder_and_proj KNOWLEDGE.WORDNET.USE_HIERARCHY $use_wordnet_hierachy KNOWLEDGE.WORDNET.USE_DEFINITION $use_wordnet_definition KNOWLEDGE.WIKITIONARY.USE_DEFINITION $use_wiktionary_definition KNOWLEDGE.GPT3.USE_GPT3 $use_gpt3 KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS $use_gpt3_count TEST.MODEL_FILE "$model_ckpt" $EXTRA_OPTS
else
    echo "Unknown mode! Please check and set mode to one of {linear_probe, finetune, zeroshot, kadaptation, lora, adapter, compacter}."
    exit 1
fi
