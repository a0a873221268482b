"""CLI: KAdaptation (Kronecker-factored delta-W) on CLIP.

Reference command surface: vision_benchmark/commands/kronecker_adaptation_clip.py.
"""

from ._common import run_training_command


def main(argv=None):
    return run_training_command("kadaptation", description="Test a classification model, with finetuning.", argv=argv)


if __name__ == "__main__":
    main()
