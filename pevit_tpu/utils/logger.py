"""Run logging: per-run output dir + file/console logger.

Mirrors reference utils/utils.py:14-46 (``create_logger``): output path is
``OUTPUT_DIR/<dataset>/<cfg_name>``, log file named
``<phase>_<timestamp>_rank<r>.txt`` so the reference's result-scraper scripts
(read_results.py / read_txt.py) work against our artifacts unchanged.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from pathlib import Path

from . import dist as comm


def setup_logger(final_output_dir: str, rank: int, phase: str) -> str:
    time_str = time.strftime("%Y-%m-%d-%H-%M")
    log_file = f"{phase}_{time_str}_rank{rank}.txt"
    final_log_file = os.path.join(final_output_dir, log_file)
    head = f"%(asctime)-15s:[P:{rank}]:%(message)s"
    logging.basicConfig(filename=str(final_log_file), format=head, force=True)
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    console = logging.StreamHandler(stream=sys.stdout)
    console.setFormatter(logging.Formatter(head))
    logging.getLogger("").addHandler(console)
    return final_log_file


def create_logger(config, phase: str = "train") -> str:
    root_output_dir = Path(config.OUTPUT_DIR)
    dataset = config.DATASET.DATASET
    cfg_name = config.NAME

    final_output_dir = root_output_dir / dataset / cfg_name
    final_output_dir.mkdir(parents=True, exist_ok=True)
    print(f"=> creating {final_output_dir}")

    setup_logger(str(final_output_dir), comm.rank(), phase)
    return str(final_output_dir)


def log_config(config, args=None) -> None:
    logging.info("=> configuration:\n%s", config.dump())
    if args is not None:
        logging.info("=> args: %s", vars(args))
