#!/usr/bin/env python
"""Extract dataset class names + prompt templates into JSON resources.

The class-name lists and CLIP prompt templates are public benchmark DATA
(originating from OpenAI's CLIP repo / the ELEVATER toolkit), not code.  This
tool loads the reference's ``prompts.py`` as a data source and re-serialises
the two maps into ``resources/metadata/class_names.json`` and
``resources/metadata/prompt_templates.json`` — our framework consumes only
the JSON (see pevit_tpu/data/prompts.py).

Usage: python tools/import_class_metadata.py [/path/to/reference]
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    ref = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/reference")
    src = ref / "vision_benchmark" / "datasets" / "prompts.py"
    spec = importlib.util.spec_from_file_location("ref_prompts", src)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = REPO / "resources" / "metadata"
    out.mkdir(parents=True, exist_ok=True)

    class_names = {k: v for k, v in mod.class_map.items()}
    templates = {k: v for k, v in mod.template_map.items()}

    (out / "class_names.json").write_text(json.dumps(class_names, indent=0, ensure_ascii=False))
    (out / "prompt_templates.json").write_text(json.dumps(templates, indent=0, ensure_ascii=False))
    print(f"wrote {len(class_names)} class lists, {len(templates)} template lists -> {out}")


if __name__ == "__main__":
    main()
