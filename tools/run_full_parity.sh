#!/bin/bash
# Day-1 ONLINE accuracy-parity runbook (VERDICT r3 next #4).
#
# This repo is built offline (no network egress): module/whole-run parity vs
# the reference's own torch code is proven in tests/, but the north-star
# check — the published 20-dataset ELEVATER numbers (BASELINE.md, reference
# README.md:84-89) at ±0.3 pts — needs real OpenAI weights + ELEVATER data.
# On the first machine WITH network, this script is that check as ONE
# command:
#
#   tools/run_full_parity.sh                # full campaign (days of compute)
#   tools/run_full_parity.sh --plan         # print every step, run nothing
#
# Stages:
#   1. fetch + sha256-verify OpenAI CLIP checkpoints  (fetch_clip_checkpoints.py;
#      URL scheme = reference clip_load.py:30-73)
#   2. stage ELEVATER datasets under $DATA_DIR        (prepare_dataset.py decode cache)
#   3. validate checkpoint key maps                   (validate_checkpoints.py)
#   4. campaign: methods x 20 datasets x 3 seeds      (scripts/run_multi.sh; the
#      job/sweep crash-resume caches are ON, so re-running this script resumes)
#   5. aggregate + diff vs BASELINE.md at ±0.3        (read_results.py,
#      check_parity_vs_baseline.py)
#
# Env overrides: OUT, DATA_DIR, METHODS, MODEL_CFG, NUM_SHOTS, CLIP_MODELS.

set -euo pipefail
cd "$(dirname "$0")/.."

PLAN=0
for a in "$@"; do [ "$a" = "--plan" ] && PLAN=1; done

OUT=${OUT:-$PWD/PARITY_OUT}
DATA_DIR=${DATA_DIR:-$OUT/datasets}
METHODS=${METHODS:-"kadaptation lora adapter compacter finetune linear_probe zeroshot"}
MODEL_CFG=${MODEL_CFG:-vitb32_CLIP}
NUM_SHOTS=${NUM_SHOTS:-5}
CLIP_MODELS=${CLIP_MODELS:-"ViT-B/32,ViT-B/16"}
SEEDS="0 1 2"
# the reference's 20-dataset ELEVATER list (scripts/kadapter_clip.sh loop)
DATASETS="cifar10 cifar100 dtd eurosat-clip fer2013 fgvc-aircraft-2013b food101 gtsrb flower102 oxford-iiit-pets rendered-sst2 resisc45-clip stanfordcar country211 kitti-distance mnist patchcamelyon caltech101 hateful-memes voc2007classification"

run() {
    if [ "$PLAN" = 1 ]; then echo "[plan] $*"; else echo "[run]  $*"; "$@"; fi
}

echo "== stage 1/5: OpenAI CLIP checkpoints =="
if [ "$PLAN" = 1 ]; then
    python tools/fetch_clip_checkpoints.py --models "$CLIP_MODELS" --plan
else
    python tools/fetch_clip_checkpoints.py --models "$CLIP_MODELS"
fi

echo "== stage 2/5: ELEVATER datasets -> $DATA_DIR =="
echo "#  Source: the ELEVATER toolkit blob (pevit_tpu/data/hub.py:"
echo "#  VISION_DATASET_STORAGE) via the 'vision-datasets' package, or any"
echo "#  mirror. Each dataset goes to \$DATA_DIR/<name> in a layout"
echo "#  pevit_tpu/data/sources.py accepts (ImageFolder / ELEVATER"
echo "#  {split}.json manifests / CIFAR pickles)."
for ds in $DATASETS; do
    run python tools/prepare_dataset.py --root "$DATA_DIR/$ds" --dataset "$ds" --splits train,val,test
done

echo "== stage 3/5: checkpoint key-map validation =="
for m in $(echo "$CLIP_MODELS" | tr ',' ' '); do
    f="$HOME/.cache/clip/$(echo "$m" | tr '/' '-').pt"
    run python tools/validate_checkpoints.py --ckpt "$f" --family clip
done

echo "== stage 4/5: campaign ($METHODS) x 20 datasets x 3 seeds =="
for method in $METHODS; do
    for seed in $SEEDS; do
        for ds in $DATASETS; do
            run env MODE="$method" DATASET="$ds" MODEL_CFG="$MODEL_CFG" \
                OUTPUT_DIR="$OUT/$method/seed$seed" RANDOM_SEED="$seed" \
                NUM_SHOTS="$NUM_SHOTS" USE_FP32=False \
                EXTRA_OPTS="DATASET.ROOT $DATA_DIR/$ds" \
                bash scripts/run_multi.sh
        done
    done
done

echo "== stage 5/5: aggregate + diff vs BASELINE.md (±0.3) =="
for method in $METHODS; do
    run python read_results.py "$OUT/$method"
done
# zeroshot has no published README average (BASELINE.md) — exclude it from
# the ±0.3 diff; its per-dataset numbers still land in $OUT for inspection
BASELINE_METHODS=$(echo "$METHODS" | tr ' ' '\n' | grep -v '^zeroshot$' | paste -sd, -)
run python tools/check_parity_vs_baseline.py --out "$OUT" \
    --methods "$BASELINE_METHODS"

if [ "$PLAN" = 1 ]; then
    echo "PLAN COMPLETE: $(echo "$METHODS" | wc -w) methods x 20 datasets x 3 seeds"
    # measured campaign cost (tools/campaign_cost.py on the real chip)
    if [ -f docs/campaign_cost.json ]; then
        python - <<'PYEOF'
import json
r = json.load(open("docs/campaign_cost.json"))
m = r["measured"]
cells = ", ".join(f"{k} {v['warm_s']}s" for k, v in m["per_method"].items())
print(f"Projected cost (measured warm cells: {cells}"
      f"{' [SMOKE shapes]' if m.get('smoke') else ''}): "
      f"{r['full_campaign_20ds_x_3seed_x_6method_chip_hours']} chip-hours "
      f"for the full 20x3x6 campaign (one v5e chip; zeroshot arm is eval-only noise on top)")
PYEOF
    fi
else
    echo "PARITY RUN COMPLETE — see check_parity_vs_baseline output above."
fi
