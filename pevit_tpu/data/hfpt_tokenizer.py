"""HuggingFace tokenizer adapter.

Reference: datasets/hfpt_tokenizer.py — wraps a HuggingFace pretrained
tokenizer behind the CLIP-tokenizer calling convention
(``tokenizer(texts, context_length) -> (N, L) ids``), with the GPT-2
pad/sep special-casing (:32-34, :84-86: GPT has no pad token, so eos is
used for padding).
"""

from __future__ import annotations

from typing import List, Union

import numpy as np


class HFPTTokenizer:
    def __init__(self, pt_name: str = "bert-base-cased"):
        from transformers import AutoTokenizer

        self.pt_name = pt_name
        self.added_sep_token = 0
        self.added_cls_token = 0
        self.gpt_special_case = "gpt" in pt_name.lower()
        self.tokenizer = AutoTokenizer.from_pretrained(pt_name)

        if self.tokenizer.sep_token is None:
            self.tokenizer.add_special_tokens({"sep_token": "[SEP]"})
            self.added_sep_token = 1
        if self.tokenizer.cls_token is None:
            self.tokenizer.add_special_tokens({"cls_token": "[CLS]"})
            self.added_cls_token = 1
        if self.gpt_special_case:
            # GPT has no pad token; pad with eos (reference :32-34)
            self.tokenizer.pad_token = self.tokenizer.eos_token

    def get_vocab_size(self) -> int:
        return len(self.tokenizer)

    def get_eot_token(self):
        return self.tokenizer.encode(self.tokenizer.sep_token, add_special_tokens=False)[0]

    def get_sot_token(self):
        return self.tokenizer.encode(self.tokenizer.cls_token, add_special_tokens=False)[0]

    def __call__(self, texts: Union[str, List[str]], context_length: int = 77) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=context_length,
            return_tensors="np",
        )
        return out["input_ids"].astype(np.int32)


def build_tokenizer(tokenizer_name: str = "clip"):
    """Tokenizer factory (reference datasets/languages/build.py:5-16)."""
    if tokenizer_name == "clip":
        from .tokenizer import get_tokenizer, tokenize

        class _ClipCallable:
            def __call__(self, texts, context_length=77):
                return tokenize(texts, context_length=context_length, truncate=True)

            def get_eot_token(self):
                return get_tokenizer().encoder["<|endoftext|>"]

        return _ClipCallable()
    if tokenizer_name.startswith("hf_"):
        return HFPTTokenizer(pt_name=tokenizer_name[3:])
    raise ValueError(f"Unknown tokenizer: {tokenizer_name}")
