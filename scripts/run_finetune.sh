#!/bin/bash
############## Configuration section ##################
mode=finetune
model_cfg=vitb32_CLIP
num_shots=5
disable_hyperparameter_tuning=False
learning_rate=0.0
l2_weight_decay=0.0
data_dir=../DATASET
output_dir=../OUTPUT
model_ckpt=''
init_head_with_text_encoder=True
merge_encoder_and_proj=False
############## Configuration section ends ##################

cd "$(dirname "$0")/.."

for dataset in cifar10 cifar100 dtd eurosat-clip fer2013 fgvc-aircraft-2013b food101 gtsrb flower102 oxford-iiit-pets rendered-sst2 resisc45-clip stanfordcar country211 kitti-distance mnist patchcamelyon caltech101 hateful-memes voc2007classification
do
    for random_seed in 0 1 2
    do
        if [ "$mode" = "zeroshot" ]; then
            python -m pevit_tpu.commands.zeroshot --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml DATASET.ROOT $data_dir/datasets OUTPUT_DIR $output_dir/$random_seed/$model_cfg/log TEST.MODEL_FILE "$model_ckpt"
        else
            python -m pevit_tpu.commands.finetune --ds resources/datasets/$dataset.yaml --model resources/model/$model_cfg.yaml --no-tuning $disable_hyperparameter_tuning --lr $learning_rate --l2 $l2_weight_decay DATASET.NUM_SAMPLES_PER_CLASS $num_shots DATASET.ROOT $data_dir/datasets OUTPUT_DIR $output_dir/$random_seed/$model_cfg/log DATASET.RANDOM_SEED_SAMPLING $random_seed TRAIN.INIT_HEAD_WITH_TEXT_ENCODER $init_head_with_text_encoder TRAIN.MERGE_ENCODER_AND_HEAD_PROJ $merge_encoder_and_proj TEST.MODEL_FILE "$model_ckpt"
        fi
    done
done
