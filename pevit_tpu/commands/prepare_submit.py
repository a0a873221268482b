"""CLI: merge per-seed prediction JSONs into a leaderboard submission zip.

Reference: vision_benchmark/commands/prepare_submit.py:27-68 — for each
dataset, combine the per-seed JSONs (mean of num_trainable_params, chained
rnd_seeds/predictions) and zip everything as ``all_predictions.zip``.
"""

from __future__ import annotations

import argparse
import json
import os
import zipfile
from collections import defaultdict

from ._common import json_prec_dump


def combine_seed_files(files: list) -> dict:
    datas = [json.load(open(f)) for f in files]
    combined = dict(datas[0])
    combined["num_trainable_params"] = (
        sum(d.get("num_trainable_params") or 0 for d in datas) / len(datas)
    )
    combined["rnd_seeds"] = [s for d in datas for s in d["rnd_seeds"]]
    combined["predictions"] = [p for d in datas for p in d["predictions"]]
    return combined


def main(argv=None):
    parser = argparse.ArgumentParser(description="Prepare leaderboard submission.")
    parser.add_argument("--combine_path", required=True, type=str,
                        help="Folder holding seed{S}_{dataset}.json prediction files.")
    args = parser.parse_args(argv)

    by_dataset = defaultdict(list)
    for fname in sorted(os.listdir(args.combine_path)):
        if fname.endswith(".json") and fname.startswith("seed"):
            dataset = fname.split("_", 1)[1][: -len(".json")]
            by_dataset[dataset].append(os.path.join(args.combine_path, fname))

    out_zip = os.path.join(args.combine_path, "all_predictions.zip")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as zf:
        for dataset, files in sorted(by_dataset.items()):
            combined = combine_seed_files(files)
            zf.writestr(f"{dataset}.json", json_prec_dump(combined))
    print(f"wrote {out_zip} with {len(by_dataset)} datasets")
    return out_zip


if __name__ == "__main__":
    main()
