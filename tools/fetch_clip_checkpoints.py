#!/usr/bin/env python
"""Download + sha256-verify the OpenAI CLIP checkpoints (day-1 online step).

URL/sha256 scheme copied from the reference's downloader contract
(clip_load.py:30-73: the sha256 is the second-to-last URL path segment and
is verified after download).  Files land in ``~/.cache/clip`` under the
exact names ``pevit_tpu.ckpt.load_clip`` resolves (torch_loader.py:34-42),
so every command picks them up with no config change.

    python tools/fetch_clip_checkpoints.py --models "ViT-B/32,ViT-B/16"
    python tools/fetch_clip_checkpoints.py --plan   # print actions, no network

Exit codes: 0 all present+verified, 1 any failure.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import urllib.request

# reference clip_load.py:32-43
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(name: str, root: str, plan: bool = False) -> bool:
    url = MODELS[name]
    expected = url.split("/")[-2]
    target = os.path.join(root, os.path.basename(url))
    if os.path.isfile(target):
        if _sha256(target) == expected:
            print(f"[ok]   {name}: {target} (sha256 verified)")
            return True
        print(f"[warn] {name}: {target} exists but sha256 mismatches; re-download")
    if plan:
        print(f"[plan] {name}: would download {url} -> {target}")
        return True
    os.makedirs(root, exist_ok=True)
    print(f"[get]  {name}: {url}")
    tmp = target + ".part"
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if _sha256(tmp) != expected:
        os.unlink(tmp)
        print(f"[FAIL] {name}: sha256 mismatch after download", file=sys.stderr)
        return False
    os.replace(tmp, target)
    print(f"[ok]   {name}: downloaded + verified")
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", default="ViT-B/32,ViT-B/16",
                    help="comma-separated model names (see clip_load.py:32-43)")
    ap.add_argument("--root", default=os.path.expanduser("~/.cache/clip"))
    ap.add_argument("--plan", action="store_true",
                    help="print actions without any network access")
    args = ap.parse_args(argv)
    ok = True
    for name in [m.strip() for m in args.models.split(",") if m.strip()]:
        if name not in MODELS:
            print(f"[FAIL] unknown model {name!r}; choices: {sorted(MODELS)}", file=sys.stderr)
            ok = False
            continue
        ok &= fetch(name, args.root, plan=args.plan)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
