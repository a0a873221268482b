"""CLIP BPE tokenizer.

From-scratch implementation of the byte-level BPE scheme used by OpenAI CLIP
(reference vendored copy: vision_benchmark/datasets/simple_tokenizer.py; the
vocabulary ``bpe_simple_vocab_16e6.txt.gz`` is OpenAI's public data file,
shipped under resources/).  The environment lacks ``ftfy``; its role in the
original (unicode mojibake repair) is approximated with NFKC normalisation +
html unescape, which is a no-op for the ASCII prompt templates the benchmark
feeds through it.

``tokenize`` matches the reference contract (clip_load.py:484-516): start/end
tokens, zero padding to context_length, error-or-truncate on overflow.
"""

from __future__ import annotations

import gzip
import html
import os
import unicodedata
from functools import lru_cache
from typing import List, Union

import numpy as np
import regex as re

_DEFAULT_BPE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "resources",
    "bpe_simple_vocab_16e6.txt.gz",
)


@lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (GPT-2/CLIP scheme)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("\xa1"), ord("\xac") + 1)) + list(range(ord("\xae"), ord("\xff") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def get_pairs(word: tuple) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = unicodedata.normalize("NFKC", text)
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class ClipTokenizer:
    def __init__(self, bpe_path: str = _DEFAULT_BPE, mask_token: bool = False):
        """``mask_token=True`` reproduces the DeCLIP-family vocabulary
        (models/declip_model/utils/text_utils/simple_tokenizer.py:61-79):
        ``<|mask|>`` is inserted BEFORE sot/eot, shifting their ids by +1
        (vocab 49409, sot=49407, eot=49408)."""
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        if mask_token:
            vocab.append("<|mask|>")
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}
        if mask_token:
            self.cache["<|mask|>"] = "<|mask|>"
        self.pat = re.compile(
            r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = get_pairs(word)
        result = " ".join(word)
        self.cache[token] = result
        return result

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        text = _clean(text)
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


_tokenizer_singleton = None
_declip_tokenizer_singleton = None


def get_tokenizer() -> ClipTokenizer:
    global _tokenizer_singleton
    if _tokenizer_singleton is None:
        _tokenizer_singleton = ClipTokenizer()
    return _tokenizer_singleton


def get_declip_tokenizer() -> ClipTokenizer:
    global _declip_tokenizer_singleton
    if _declip_tokenizer_singleton is None:
        _declip_tokenizer_singleton = ClipTokenizer(mask_token=True)
    return _declip_tokenizer_singleton


def declip_tokenize(texts: Union[str, List[str]], context_length: int = 77) -> np.ndarray:
    """DeCLIP-contract tokenize (declip_model/text_encoder/text_transformer.py:
    144-180): shifted vocab ids, silent truncation that keeps sot + the first
    context_length-2 body tokens + eot."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_declip_tokenizer()
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tok.encode(text) + [eot]
        if len(tokens) > context_length:
            tokens = [tokens[0]] + tokens[1 : context_length - 1] + [tokens[-1]]
        result[i, : len(tokens)] = tokens
    return result


def tokenize(
    texts: Union[str, List[str]], context_length: int = 77, truncate: bool = False
) -> np.ndarray:
    """Reference-contract tokenize (clip_load.py:484-516): (N, L) int32."""
    if isinstance(texts, str):
        texts = [texts]
    tok = get_tokenizer()
    sot, eot = tok.encoder["<|startoftext|>"], tok.encoder["<|endoftext|>"]
    result = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tok.encode(text) + [eot]
        if len(tokens) > context_length:
            if truncate:
                tokens = tokens[:context_length]
                tokens[-1] = eot
            else:
                raise RuntimeError(f"Input {texts[i]!r} is too long for context length {context_length}")
        result[i, : len(tokens)] = tokens
    return result
