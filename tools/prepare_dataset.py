#!/usr/bin/env python
"""Offline dataset preprocessing: decode -> sharded cache -> consolidated npz.

Full-shot ELEVATER datasets (food-101 ~100K images, patch-camelyon ~260K)
take hours to decode on a 1-core host, so the decode is a RESUMABLE one-time
cost: shards of 2048 entries are written as they finish
(``{split}.shardNNNNN.npz`` + ``{split}.cache.json`` under DATASET.ROOT);
re-running after an interruption resumes at the first undecoded entry, and a
completed run consolidates into the single ``{split}.npz`` fast path the
loaders prefer (pevit_tpu/data/sources.py).

Usage:
    python tools/prepare_dataset.py --root /data/food-101 \\
        --dataset food-101 --splits train,test --image-size 224

Accepts any layout sources.py understands: ImageFolder trees
(``root/{split}/{class}/*.jpg``), ELEVATER-style ``{split}.json`` manifests,
or CIFAR python pickles.  Progress + ETA are logged per shard.
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--root", required=True, help="DATASET.ROOT directory")
    ap.add_argument("--dataset", default="", help="dataset name (for CIFAR detection / logging)")
    ap.add_argument("--splits", default="train,test", help="comma-separated splits to preprocess")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--num-classes", type=int, default=0, help="needed for multilabel manifests")
    ap.add_argument("--no-center-crop", action="store_true",
                    help="exact (size, size) resize instead of shorter-side+crop "
                         "(DATASET.CENTER_CROP False); caches under {split}.nocrop.npz")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    from pevit_tpu.data.sources import load_split

    for split in args.splits.split(","):
        split = split.strip()
        ds = load_split(
            args.dataset or "local", args.root, split,
            image_size=args.image_size, num_classes=args.num_classes,
            allow_synthetic=False, cache=True,
            center_crop=not args.no_center_crop,
        )
        tag = split if not args.no_center_crop else f"{split}.nocrop"
        logging.info("%s: %d images ready (%s)", split, len(ds),
                     Path(args.root) / f"{tag}.npz")


if __name__ == "__main__":
    main()
