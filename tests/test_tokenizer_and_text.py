"""Tokenizer + prompt metadata + text-feature extraction tests."""

import numpy as np
import pytest

from pevit_tpu.data.prompts import get_class_names, get_templates
from pevit_tpu.data.tokenizer import get_tokenizer, tokenize


def test_tokenizer_roundtrip_and_known_ids():
    tok = get_tokenizer()
    # vocab size and special tokens match OpenAI CLIP
    assert len(tok.encoder) == 49408
    assert tok.encoder["<|startoftext|>"] == 49406
    assert tok.encoder["<|endoftext|>"] == 49407
    ids = tok.encode("a photo of a cat")
    assert tok.decode(ids).strip() == "a photo of a cat"
    # known CLIP encoding: "a photo of a cat" -> [320, 1125, 539, 320, 2368]
    assert ids == [320, 1125, 539, 320, 2368]


def test_tokenize_contract():
    out = tokenize(["a photo of a dog", "hello world"], context_length=77)
    assert out.shape == (2, 77)
    assert out.dtype == np.int32
    assert out[0, 0] == 49406
    # eot right after the tokens, zero padding after
    row = out[0]
    eot_pos = int(np.where(row == 49407)[0][0])
    assert (row[eot_pos + 1 :] == 0).all()

    with pytest.raises(RuntimeError):
        tokenize(["word " * 100], context_length=16, truncate=False)
    tr = tokenize(["word " * 100], context_length=16, truncate=True)
    assert tr.shape == (1, 16) and tr[0, -1] == 49407


def test_prompt_metadata():
    assert get_class_names("cifar-10") == [
        "airplane", "automobile", "bird", "cat", "deer",
        "dog", "frog", "horse", "ship", "truck",
    ]
    assert len(get_class_names("country211")) == 211
    assert len(get_templates("cifar-10")) == 18
    assert get_templates("not-a-dataset") == ["a photo of a {}"]
    for ds in ["cifar-100", "food-101", "oxford-iiit-pets", "voc-2007-classification",
               "hateful-memes", "kitti-distance", "stanford-cars", "gtsrb"]:
        assert get_class_names(ds), ds


def test_extract_text_features_shapes():
    import jax
    from pevit_tpu.config import get_default_config
    from pevit_tpu.core import CLIPSpec, TextSpec, VisionSpec, init_clip_params
    from pevit_tpu.evaluation import extract_text_features

    spec = CLIPSpec(
        embed_dim=16,
        vision=VisionSpec(input_resolution=32, patch_size=16, width=32, layers=1, heads=2, output_dim=16),
        text=TextSpec(context_length=77, vocab_size=49408, width=32, heads=2, layers=1, output_dim=16),
    )
    params = init_clip_params(jax.random.PRNGKey(0), spec)
    cfg = get_default_config()
    cfg.DATASET.DATASET = "cifar-10"
    w = extract_text_features(cfg, params, spec, chunk=64)
    assert w.shape == (16, 10)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, rtol=1e-5)


def test_knowledge_augmented_prompts():
    from pevit_tpu.config import get_default_config
    from pevit_tpu.evaluation.text_features import build_prompts

    cfg = get_default_config()
    cfg.DATASET.DATASET = "cifar-10"
    cfg.KNOWLEDGE.WIKITIONARY.WIKI_DICT_PATH = "resources/knowledge/external"
    cfg.KNOWLEDGE.GPT3.GPT3_DICT_PATH = "resources/knowledge/gpt3"

    texts_plain, off_plain = build_prompts(cfg)
    assert len(texts_plain) == 10 * 18

    cfg.KNOWLEDGE.WIKITIONARY.USE_DEFINITION = True
    texts_wiki, _ = build_prompts(cfg)
    assert len(texts_wiki) == len(texts_plain)
    assert any("airplane" in t and ";" in t for t in texts_wiki[:18])

    cfg.KNOWLEDGE.GPT3.USE_GPT3 = True
    cfg.KNOWLEDGE.AGGREGATION.MEHTOD = "WIKI_AND_GPT3"
    texts_both, _ = build_prompts(cfg)
    assert len(texts_both) == 2 * len(texts_plain)  # wiki + 1 gpt3 item
