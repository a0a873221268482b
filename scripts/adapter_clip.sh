#!/bin/bash
############## Configuration section ##################
# TPU-native launcher mirroring the reference scripts/adapter_clip.sh surface.

model_cfg=vitb32_CLIP            # vitb32_CLIP | vitb16_CLIP
num_shots=5                      # 5 | 20 | 50 | -1 (full)
disable_hyperparameter_tuning=False
learning_rate=0.0
l2_weight_decay=0.0
use_fp32=False

data_dir=../DATASET
output_dir=../OUTPUT
model_ckpt=''

init_head_with_text_encoder=True
merge_encoder_and_proj=False

use_wordnet_hierachy=False
use_wordnet_definition=False
use_wiktionary_definition=False
use_gpt3=False
use_gpt3_count=0
############## Configuration section ends ##################

cd "$(dirname "$0")/.."

for dataset in cifar10 cifar100 dtd eurosat-clip fer2013 fgvc-aircraft-2013b food101 gtsrb flower102 oxford-iiit-pets rendered-sst2 resisc45-clip stanfordcar country211 kitti-distance mnist patchcamelyon caltech101 hateful-memes voc2007classification
do
    for random_seed in 0 1 2
    do
        python -m pevit_tpu.commands.adapter_clip --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml --no-tuning $disable_hyperparameter_tuning --lr $learning_rate --l2 $l2_weight_decay MODEL.CLIP_FP32 $use_fp32 DATASET.NUM_SAMPLES_PER_CLASS $num_shots DATASET.ROOT $data_dir/datasets OUTPUT_DIR $output_dir/$random_seed/$model_cfg/log DATASET.RANDOM_SEED_SAMPLING $random_seed TRAIN.INIT_HEAD_WITH_TEXT_ENCODER $init_head_with_text_encoder TRAIN.MERGE_ENCODER_AND_HEAD_PROJ $merge_encoder_and_proj KNOWLEDGE.WORDNET.USE_HIERARCHY $use_wordnet_hierachy KNOWLEDGE.WORDNET.USE_DEFINITION $use_wordnet_definition KNOWLEDGE.WIKITIONARY.USE_DEFINITION $use_wiktionary_definition KNOWLEDGE.GPT3.USE_GPT3 $use_gpt3 KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS $use_gpt3_count TEST.MODEL_FILE $model_ckpt
    done
done
