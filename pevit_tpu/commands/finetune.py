"""CLI: full fine-tuning.

Reference command surface: vision_benchmark/commands/finetune.py (same
trainer as linear probe; freezing differs via TRAIN.FREEZE_IMAGE_BACKBONE).
"""

from ._common import run_training_command


def main(argv=None):
    return run_training_command(
        "full_finetune",
        description="Test a classification model, with finetuning.",
        argv=argv,
    )


if __name__ == "__main__":
    main()
