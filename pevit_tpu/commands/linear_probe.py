"""CLI: linear probing of a frozen backbone.

Reference command surface: vision_benchmark/commands/linear_probe.py
(including --emulate-zeroshot, :69-76).
"""

from ._common import run_training_command


def main(argv=None):
    return run_training_command(
        "linear_probe",
        description="Test a classification model, with linear probing.",
        probe=True,
        argv=argv,
    )


if __name__ == "__main__":
    main()
