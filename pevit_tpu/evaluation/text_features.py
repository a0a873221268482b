"""Zero-shot text-feature extraction (classifier-head init / zeroshot eval).

Reference: ``extract_text_features`` (feature.py:405-531): per class, format
every prompt template (optionally augmented with WordNet/Wiktionary/GPT-3
knowledge snippets), tokenize, encode with the text tower, L2-normalise each
embedding, average over templates, renormalise.  Returns (embed_dim, K).

TPU-native: all prompts of all classes tokenize on host, then encode in one
padded, jitted, chunked batch — one device round trip instead of the
reference's per-class loop (important on a high-latency device link).

Knowledge augmentation (SURVEY.md §5.9): TSV/JSON files keyed by classname,
data under resources/knowledge/ (external: def_wiki/def_wn/path_wn;
gpt3: gpt3 list).  The reference tokenizes knowledge text with nltk
word_tokenize (feature.py:505); we use a regex equivalent (no network for
nltk data downloads).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import regex as re

from ..core.clip import CLIPSpec, encode_text
from ..data.prompts import get_class_names, get_templates
from ..data.tokenizer import tokenize

_WORD_RE = re.compile(r"\w+|[^\w\s]")


def _word_tokenize(text: str) -> list:
    """nltk.word_tokenize stand-in for the knowledge-text cleanup path
    (feature.py:505); punkt data is not downloadable in this environment."""
    return _WORD_RE.findall(text)


def _load_knowledge_dict(config, kind: str) -> dict:
    """Load the wiki/wordnet knowledge dict (feature.py:416-459)."""
    wiki_path = config.KNOWLEDGE.WIKITIONARY.WIKI_DICT_PATH
    tsv = os.path.join(wiki_path, config.DATASET.DATASET + "_knowledge.tsv")
    entries = json.load(open(tsv, encoding="utf-8"))
    out = {}
    count = 0
    for k2v in entries:
        if kind == "def_wiki":
            val = k2v["def_wiki"]
        elif kind == "def_wn":
            val = k2v["def_wn"]
        else:  # hierarchy (feature.py:442-459): join first <=3 wordnet path items
            path_wn = k2v["path_wn"]
            val = " ".join(path_wn[: min(3, len(path_wn))]) if len(path_wn) > 0 else path_wn
        out[k2v["classname"]] = val
        if val:
            count += 1
    logging.info("knowledge coverage is %d / %d", count, len(out))
    return out


def _load_gpt3_dict(config) -> dict:
    gpt3_tsv = os.path.join(
        config.KNOWLEDGE.GPT3.GPT3_DICT_PATH, "GPT3_" + config.DATASET.DATASET + ".tsv"
    )
    entries = json.load(open(gpt3_tsv, encoding="utf-8"))
    return {k2v["classname"]: k2v["gpt3"] for k2v in entries}


def build_prompts(config, class_names: Optional[list] = None) -> tuple:
    """Format all prompt texts; returns (texts, class_offsets).

    ``texts`` is the flat list over classes x templates (x knowledge items);
    ``class_offsets[i]`` slices class i's prompts out of the flat list.
    """
    dataset = config.DATASET.DATASET
    if class_names is None:
        class_names = get_class_names(dataset)
    if not class_names:
        raise ValueError(f"No class names known for dataset {dataset!r}")
    templates = get_templates(dataset)

    use_wiki = config.KNOWLEDGE.WIKITIONARY.USE_DEFINITION
    use_wn_def = config.KNOWLEDGE.WORDNET.USE_DEFINITION
    use_wn_hier = config.KNOWLEDGE.WORDNET.USE_HIERARCHY
    use_gpt3 = config.KNOWLEDGE.GPT3.USE_GPT3

    wiki_dict = {}
    if use_wiki:
        wiki_dict = _load_knowledge_dict(config, "def_wiki")
    elif use_wn_def:
        wiki_dict = _load_knowledge_dict(config, "def_wn")
    elif use_wn_hier:
        wiki_dict = _load_knowledge_dict(config, "hierarchy")
    gpt3_dict = _load_gpt3_dict(config) if use_gpt3 else {}

    texts, offsets = [], []
    wiki_count = gpt3_count = 0
    for classname in class_names:
        if isinstance(classname, list):
            classname = classname[0]
        knowledge_text_list = []
        if (use_wiki or use_wn_def or use_wn_hier) and classname in wiki_dict:
            knowledge_text_list.append(wiki_dict[classname])
            wiki_count += 1
        if use_gpt3:
            method = config.KNOWLEDGE.AGGREGATION.MEHTOD
            n_items = config.KNOWLEDGE.AGGREGATION.NUM_GPT3_ITEMS
            if method == "WIKI_AND_GPT3" or (method == "WIKI_THEN_GPT3" and not knowledge_text_list):
                for kt in gpt3_dict.get(classname, [])[:n_items]:
                    knowledge_text_list.append(kt)
                    gpt3_count += 1

        aug = []
        for kt in knowledge_text_list:
            kt = f" ; {classname} , " + kt if kt is not None else ""
            aug.append(" " + " ".join(_word_tokenize(kt)))

        start = len(texts)
        if not aug:
            texts.extend(t.format(classname) for t in templates)
        else:
            texts.extend(t.format(classname) + k for k in aug for t in templates)
        offsets.append((start, len(texts)))
    logging.info("=> Knowledge source count | knowledge_count: %d | gpt3_count %d", wiki_count, gpt3_count)
    return texts, offsets


def extract_text_features(
    config,
    clip_params: dict,
    spec: CLIPSpec,
    *,
    class_names: Optional[list] = None,
    chunk: int = 256,
    return_numpy: bool = True,
):
    """Zero-shot classifier weights (embed_dim, K) from the text tower."""
    start = time.time()
    texts, offsets = build_prompts(config, class_names)
    context_length = config.MODEL.SPEC.TEXT.CONTEXT_LENGTH
    tokens = tokenize(texts, context_length=context_length, truncate=True)

    # Ship ONLY the text subtree to the device: passing the whole CLIP tree
    # transfers the (unused) visual tower through the relay link — measured
    # 199s first-call vs 0.2s text-only on the axon TPU (r2 probe).  The
    # subtree is passed as the jit ARGUMENT (never closed over — remote
    # compile rejects programs with big constants).
    enc = jax.jit(lambda tp, t: encode_text({"text": tp}, t, spec=spec))
    text_params = clip_params["text"]
    feats = []
    for s in range(0, len(tokens), chunk):
        batch = tokens[s : s + chunk]
        pad = 0
        if len(batch) < chunk and s > 0:  # keep one static shape for big runs
            # padding is SAFE here: the plain text tower has no PEFT
            # raw-reshape scramble, so rows are exactly independent
            pad = chunk - len(batch)
            batch = np.concatenate([batch, np.zeros((pad, context_length), np.int32)])
        out = np.asarray(enc(text_params, jnp.asarray(batch)), np.float32)
        feats.append(out[: len(out) - pad if pad else len(out)])
    emb = np.concatenate(feats)  # (n_prompts, E)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12

    weights = []
    for s, e in offsets:
        mean = emb[s:e].mean(axis=0)
        weights.append(mean / (np.linalg.norm(mean) + 1e-12))
    zeroshot = np.stack(weights, axis=1)  # (E, K)
    logging.info("=> Feature extraction duration time: %.2fs", time.time() - start)
    return zeroshot if return_numpy else jnp.asarray(zeroshot)
