"""CLI: LoRA tuning on CLIP.

Reference command surface: vision_benchmark/commands/lora_clip.py.
"""

from ._common import run_training_command


def main(argv=None):
    return run_training_command("lora", description="Test a classification model, with finetuning.", argv=argv)


if __name__ == "__main__":
    main()
