"""CLIP byte-pair-encoding tokenizer (pure Python, dependency-free).

Re-implementation of the OpenAI CLIP ``SimpleTokenizer`` that the reference
uses via ``clip.tokenize`` to bootstrap the Dose-CLIP prompt learner
(reference src/DACLIP.py:874,906-926).  Algorithm: lower-case + NFC-ish
cleanup, the CLIP pre-tokenization regex, byte-to-unicode mapping, greedy
lowest-rank BPE merges with the ``</w>`` end-of-word marker, and
SOS/EOS framing to ``context_length`` ids.

The merge table itself is DATA, not code: OpenAI ships it as
``bpe_simple_vocab_16e6.txt.gz`` (~1.3 MB, the first 48894 merges are used).
This environment has no copy and no network egress, so the tokenizer loads it
from, in order:

1. an explicit ``bpe_path`` argument,
2. ``$FOUNDDIFF_CLIP_BPE``,
3. ``~/.cache/clip/bpe_simple_vocab_16e6.txt.gz`` (where the stock ``clip``
   package caches it).

Correctness of the *algorithm* is tested against HuggingFace's
``transformers.CLIPTokenizer`` (an independent implementation of the same
spec) on synthetic vocab/merge tables — see tests/test_tokenizer.py.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Dict, List, Sequence, Tuple

import numpy as np

SOT_TOKEN = "<|startoftext|>"
EOT_TOKEN = "<|endoftext|>"

import regex  # third-party `regex` for \p{L}/\p{N} (same as openai/clip)

# the CLIP pre-tokenization pattern (contractions, words, numbers, other)
_PAT = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2/CLIP reversible byte -> unicode-char table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _clean_text(text: str) -> str:
    text = html.unescape(html.unescape(text))
    text = re.sub(r"\s+", " ", text.strip())
    return text.lower()


def default_bpe_path() -> str:
    env = os.environ.get("FOUNDDIFF_CLIP_BPE")
    if env:
        return env
    return os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz")


class ClipTokenizer:
    """SimpleTokenizer-compatible BPE tokenizer.

    ``merges``: either a path to the (possibly gzipped) merges file in the
    OpenAI format (first line a version header, then one merge per line), or
    an in-memory list of ``(first, second)`` tuples (tests).
    """

    def __init__(self, merges=None, bpe_path: str | None = None):
        if merges is None:
            path = bpe_path or default_bpe_path()
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"CLIP BPE merges not found at {path!r}. Download "
                    "bpe_simple_vocab_16e6.txt.gz (shipped with the openai/"
                    "clip package) and set FOUNDDIFF_CLIP_BPE or pass "
                    "bpe_path."
                )
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rt", encoding="utf-8") as f:
                lines = f.read().split("\n")
            # stock file: merges occupy lines [1, 49152-256-2+1); shorter
            # tables (tests/fixtures) just end early — drop blank/malformed
            # lines so trailing newlines don't become empty merges
            merges = [
                m
                for line in lines[1 : 49152 - 256 - 2 + 1]
                if len(m := tuple(line.split())) == 2
            ]
        merges = [tuple(m) for m in merges]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend([SOT_TOKEN, EOT_TOKEN])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            SOT_TOKEN: SOT_TOKEN,
            EOT_TOKEN: EOT_TOKEN,
        }
        self.sot_id = self.encoder[SOT_TOKEN]
        self.eot_id = self.encoder[EOT_TOKEN]
        # max id + 1 (synthetic merge tables may collide with base tokens;
        # the stock table has no collisions and yields 49408)
        self.vocab_size = max(self.encoder.values()) + 1

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (
                    word[i] == first
                    and i < len(word) - 1
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in _PAT.findall(_clean_text(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ")

    def tokenize(
        self,
        texts,
        context_length: int = 77,
        truncate: bool = False,
    ) -> np.ndarray:
        """``clip.tokenize`` equivalent: [SOS] + bpe ids + [EOS], zero-padded
        to ``context_length``.  Returns int32 [len(texts), context_length]."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot_id] + self.encode(text) + [self.eot_id]
            if len(ids) > context_length:
                if not truncate:
                    raise RuntimeError(
                        f"input {text!r} is too long for context length "
                        f"{context_length}"
                    )
                ids = ids[:context_length]
                ids[-1] = self.eot_id
            out[i, : len(ids)] = ids
        return out


# ---------------------------------------------------------------------------
# Dose-CLIP prompt bootstrap (reference PromptLearner.__init__,
# src/DACLIP.py:904-926): build ctx / token_prefix / token_suffix /
# eot_indices from the tokenized CT prompts + the pretrained token-embedding
# table, replacing the converter-filled buffers.
# ---------------------------------------------------------------------------

CT_PROMPTS = ("high dose CT image..", "low dose CT noisy image..")


def bootstrap_prompt_learner(
    token_embedding: np.ndarray,
    tokenizer: ClipTokenizer,
    prompts: Sequence[str] = CT_PROMPTS,
    n_ctx: int = 16,
    context_length: int = 77,
):
    """Returns ``(params, eot_indices, name_lens)`` where params holds
    ``ctx [n_cls, n_ctx, width]``, ``token_prefix [n_cls, 1, width]`` and
    ``token_suffix [n_cls, 77 - 1 - n_ctx, width]`` exactly as the reference
    initializes them (src/DACLIP.py:906-926).

    ``token_embedding``: the pretrained [vocab, width] table (converted from
    a torch checkpoint or read straight from ``Dose-CLIP.pth``).
    """
    prefix = " ".join(["X"] * n_ctx) + " "
    full = [prefix + p for p in prompts]
    ids = tokenizer.tokenize(full, context_length)  # [n_cls, 77]
    emb = token_embedding[ids]  # [n_cls, 77, width]
    params = {
        "ctx": emb[:, 1 : 1 + n_ctx].copy(),
        "token_prefix": emb[:, :1].copy(),
        "token_suffix": emb[:, 1 + n_ctx :].copy(),
    }
    eot_indices = tuple(int(i) for i in ids.argmax(axis=-1))
    # the reference hardcodes name_lens = [3, 3] ("which does not include
    # the extra '.' at the end", src/DACLIP.py:923); keep its convention
    name_lens = (3, 3)
    return params, eot_indices, name_lens
