#!/usr/bin/env python
"""Checkpoint key-mapping auditor (offline-testable).

The DeCLIP / clip_swin / Swin / timm-ViT / CLIP checkpoint key maps are
built from the reference code's layouts
(models/declip.py:31 strict=False load, clip_swin.py:244-271,
cls_swin.py:683-713, mae.py/mocov3.py, clip_load.py:95-137) but cannot be
validated against the PUBLISHED checkpoints offline (no network egress).
This tool turns that caveat into a one-command check: point it at any real
``.pt``/``.pth``/``.npz`` state_dict the day a connected machine exists —

    python tools/validate_checkpoints.py --ckpt DeCLIP_vitb32.pth --family declip

It (1) runs the ACTUAL mapper (missing/mis-shaped keys raise and are
reported), and (2) classifies every checkpoint key as mapped / ignored /
UNEXPECTED using the same prefix logic the mappers implement.  Exit codes:
0 clean, 1 unexpected-unmatched keys, 2 mapper failure.

``--family auto`` sniffs the layout from the key set.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# per-family: (mapper, mapped-prefix rules, ignored rules)
# a rule is a regex matched against the full (normalized) key
# ---------------------------------------------------------------------------

_COMMON_IGNORE = [
    r".*\.num_batches_tracked$",
    r".*\.attn_mask$",          # buffers rebuilt statically on our side
    r".*relative_position_index$",
]


def _map_clip(sd):
    from pevit_tpu.ckpt.torch_loader import state_dict_to_params

    return state_dict_to_params(sd)


def _map_declip(sd):
    from pevit_tpu.models.declip import declip_state_dict_to_params, normalize_declip_state_dict

    return declip_state_dict_to_params(normalize_declip_state_dict(sd))


def _map_clip_swin(sd):
    from pevit_tpu.models.swin import clip_swin_state_dict_to_params

    return clip_swin_state_dict_to_params(sd)


def _map_swin(sd):
    from pevit_tpu.models.swin import swin_state_dict_to_params

    return swin_state_dict_to_params(sd)


def _map_timm_vit(sd):
    from pevit_tpu.models.vit import timm_state_dict_to_params

    return timm_state_dict_to_params(sd)


def _declip_rules():
    from pevit_tpu.models.declip import _IGNORED_PREFIXES

    mapped = [
        r"visual\..*",
        r"(encode_text|text_encoder)\..*",
        r"logit_scale$",
        r"(image|text)_mapping\.(weight|bias)$",
        r"logit_scale_dense$",
    ]
    ignored = [re.escape(p) + r".*" for p in _IGNORED_PREFIXES]
    return mapped, ignored


FAMILIES = {
    "clip": (
        _map_clip,
        [
            r"visual\..*",
            r"transformer\.resblocks\..*",
            r"(token_embedding|ln_final|text_projection|positional_embedding|logit_scale).*",
        ],
        [r"(input_resolution|context_length|vocab_size)$"],  # JIT-archive scalars
    ),
    "declip": (_map_declip, None, None),  # rules resolved lazily (imports)
    "clip_swin": (
        _map_clip_swin,
        [
            r"visual\..*",
            r"text\..*",
            r"(text_projection|vision_projection|logit_scale)$",
        ],
        [],
    ),
    "swin": (
        _map_swin,
        [r"patch_embed\..*", r"layers\..*", r"norm\.(weight|bias)$", r"head\.(weight|bias)$"],
        [],
    ),
    "timm_vit": (
        _map_timm_vit,
        [
            r"(cls_token|pos_embed|patch_embed\..*)",
            r"blocks\..*",
            r"(norm|fc_norm)\.(weight|bias)$",
            r"head\.(weight|bias)$",
        ],
        [r"mask_token$"],
    ),
}


def sniff_family(keys) -> str:
    ks = set(keys)
    if any(k.startswith(("encode_text.", "text_encoder.")) for k in ks):
        return "declip"
    if "visual.conv1.weight" in ks or "visual.layer1.0.conv1.weight" in ks:
        return "clip"
    if any(k.startswith("visual.patch_embed.") for k in ks):
        return "clip_swin"
    if "patch_embed.proj.weight" in ks:
        return "swin"
    if "cls_token" in ks or "pos_embed" in ks:
        return "timm_vit"
    raise SystemExit(f"--family auto: could not sniff family from keys like {sorted(ks)[:5]}")


def load_state_dict(path: str) -> dict:
    p = Path(path)
    if p.suffix == ".npz":
        z = np.load(p, allow_pickle=False)
        return {k: z[k] for k in z.files}
    from pevit_tpu.ckpt.torch_loader import read_torch_state_dict

    return read_torch_state_dict(str(p))


def validate(sd: dict, family: str) -> dict:
    """Run the mapper + coverage classification; returns the report dict."""
    mapper, mapped_rules, ignored_rules = FAMILIES[family]
    if family == "declip":
        from pevit_tpu.models.declip import normalize_declip_state_dict

        sd = normalize_declip_state_dict(sd)
        mapped_rules, ignored_rules = _declip_rules()
    arrays = {k: v for k, v in sd.items() if hasattr(v, "shape")}

    report = {"family": family, "n_keys": len(arrays)}
    try:
        out = mapper(sd)
        params = out[0]
        import jax

        report["mapper"] = "ok"
        report["n_param_leaves"] = len(jax.tree.leaves(params))
    except Exception as e:  # noqa: BLE001 — report ANY mapper failure
        report["mapper"] = f"FAILED: {type(e).__name__}: {e}"
        report["n_param_leaves"] = 0

    mapped_re = [re.compile(r) for r in mapped_rules]
    ignored_re = [re.compile(r) for r in list(ignored_rules) + _COMMON_IGNORE]
    mapped, ignored, unexpected = [], [], []
    for k in sorted(arrays):
        if any(r.fullmatch(k) for r in ignored_re):
            ignored.append(k)
        elif any(r.fullmatch(k) for r in mapped_re):
            mapped.append(k)
        else:
            unexpected.append(k)
    report.update(
        n_mapped=len(mapped), n_ignored=len(ignored), n_unexpected=len(unexpected),
        unexpected=unexpected[:20], ignored=ignored[:20],
    )
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--ckpt", required=True, help=".pt/.pth/.npz state_dict to audit")
    ap.add_argument("--family", default="auto", choices=["auto", *FAMILIES])
    args = ap.parse_args(argv)

    sd = load_state_dict(args.ckpt)
    if args.family == "auto":
        if any(k in ("model", "state_dict") for k in sd):
            from pevit_tpu.models.declip import normalize_declip_state_dict

            family = sniff_family(normalize_declip_state_dict(sd))
        else:
            family = sniff_family(sd)
    else:
        family = args.family

    report = validate(sd, family)
    print(json.dumps(report, indent=2))
    if report["mapper"] != "ok":
        return 2
    return 1 if report["n_unexpected"] else 0


if __name__ == "__main__":
    sys.exit(main())
