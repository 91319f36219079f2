"""CLIP BPE tokenizer tests.

The real merge table (bpe_simple_vocab_16e6.txt.gz) is a data file absent in
this hermetic environment, so correctness of the ALGORITHM is established by
equivalence against ``transformers.CLIPTokenizer`` — an independent
implementation of the same BPE spec — on a synthetic merge table covering
multi-level merges, punctuation, contractions, numbers and unicode bytes.
With the real table present (FOUNDDIFF_CLIP_BPE), the same test runs against
the stock vocabulary, and the prompt-bootstrap test verifies the reference's
hardcoded EOT positions.
"""

import json
import os

import numpy as np
import pytest

from founddiff_tpu.models.tokenizer import (
    CT_PROMPTS,
    ClipTokenizer,
    bootstrap_prompt_learner,
    bytes_to_unicode,
)

# synthetic merges: enough structure for multi-level BPE (e.g. h+i, hi+</w>,
# d+o, do+se</w>, ...); everything else falls back to byte tokens
SYNTH_MERGES = [
    ("h", "i"),
    ("hi", "</w>"),
    ("d", "o"),
    ("s", "e</w>"),
    ("o", "se</w>"),
    ("d", "ose</w>"),
    ("c", "t</w>"),
    ("i", "m"),
    ("a", "g"),
    ("im", "ag"),
    ("e", "</w>"),
    ("imag", "e</w>"),
    (".", ".</w>"),
    ("1", "</w>"),
    ("'", "s</w>"),
    ("x", "</w>"),
    ("l", "o"),
    ("w", "</w>"),
    ("lo", "w</w>"),
]

TEXTS = [
    "high dose CT image..",
    "low dose CT noisy image..",
    "X X X X hi hi..",
    "it's 1 low-dose!! ct",
    "dose image, image.. HI",
    "a1b2 ... x",
]


def _hf_tokenizer(tmp_path, merges):
    transformers = pytest.importorskip("transformers")
    # build the HF vocab exactly like ClipTokenizer does
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    for m in merges:
        vocab.append("".join(m))
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    vocab_file = os.path.join(tmp_path, "vocab.json")
    merges_file = os.path.join(tmp_path, "merges.txt")
    with open(vocab_file, "w") as f:
        json.dump({t: i for i, t in enumerate(vocab)}, f)
    with open(merges_file, "w") as f:
        f.write("#version: 0.2\n")
        f.writelines(" ".join(m) + "\n" for m in merges)
    return transformers.CLIPTokenizer(
        vocab_file, merges_file, bos_token="<|startoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>",
    )


def test_bpe_matches_transformers(tmp_path):
    ours = ClipTokenizer(merges=SYNTH_MERGES)
    hf = _hf_tokenizer(str(tmp_path), SYNTH_MERGES)
    for text in TEXTS:
        want = hf(text)["input_ids"][1:-1]  # strip bos/eos
        got = ours.encode(text)
        assert got == want, (text, got, want)


def test_tokenize_framing():
    tok = ClipTokenizer(merges=SYNTH_MERGES)
    ids = tok.tokenize(["hi dose", "hi"], context_length=10)
    assert ids.shape == (2, 10)
    assert ids[0, 0] == tok.sot_id and ids[1, 0] == tok.sot_id
    # EOT is the max id -> argmax recovers its position (reference
    # src/DACLIP.py:967 relies on this)
    eots = ids.argmax(axis=-1)
    assert ids[0, eots[0]] == tok.eot_id and ids[1, eots[1]] == tok.eot_id
    assert eots[1] < eots[0]
    with pytest.raises(RuntimeError):
        tok.tokenize(["hi " * 30], context_length=8)
    trunc = tok.tokenize(["hi " * 30], context_length=8, truncate=True)
    assert trunc[0, -1] == tok.eot_id


def test_roundtrip_decode():
    tok = ClipTokenizer(merges=SYNTH_MERGES)
    text = "high dose ct image.."
    # decode re-spaces at word boundaries (punctuation pre-tokenizes apart),
    # matching the stock SimpleTokenizer's lossy-spacing decode
    assert tok.decode(tok.encode(text)).strip() == "high dose ct image .."


def test_bootstrap_prompt_learner_layout():
    """ctx/prefix/suffix split + EOT math vs a direct torch re-enactment of
    the reference PromptLearner init (src/DACLIP.py:904-926)."""
    import torch

    tok = ClipTokenizer(merges=SYNTH_MERGES)
    width = 16
    rs = np.random.RandomState(0)
    table = rs.randn(tok.vocab_size, width).astype(np.float32)

    params, eot, name_lens = bootstrap_prompt_learner(table, tok)
    n_ctx = 16
    prefix = " ".join(["X"] * n_ctx) + " "
    txt_token = torch.tensor(
        np.asarray(tok.tokenize([prefix + p for p in CT_PROMPTS], 77)),
        dtype=torch.long,
    )
    emb = torch.tensor(table)[txt_token]
    np.testing.assert_array_equal(params["ctx"], emb[:, 1 : 1 + n_ctx].numpy())
    np.testing.assert_array_equal(params["token_prefix"], emb[:, :1].numpy())
    np.testing.assert_array_equal(
        params["token_suffix"], emb[:, 1 + n_ctx :].numpy()
    )
    assert eot == tuple(txt_token.argmax(dim=-1).tolist())
    assert name_lens == (3, 3)
    assert params["ctx"].shape == (2, 16, width)
    assert params["token_prefix"].shape == (2, 1, width)
    assert params["token_suffix"].shape == (2, 60, width)


FIXTURE_GZ = os.path.join(os.path.dirname(__file__), "fixtures",
                          "bpe_tiny_vocab.txt.gz")


def test_gzip_bpe_file_loading(monkeypatch):
    """The on-disk gzip loading path (header line skipped, one merge per
    line, stock-format slice bounds) with the committed tiny fixture —
    byte-identical tokenization to the in-memory merge table, via both the
    explicit ``bpe_path`` argument and ``$FOUNDDIFF_CLIP_BPE``."""
    mem = ClipTokenizer(merges=SYNTH_MERGES)
    disk = ClipTokenizer(bpe_path=FIXTURE_GZ)
    assert disk.vocab_size == mem.vocab_size
    for text in TEXTS:
        assert disk.encode(text) == mem.encode(text), text
    np.testing.assert_array_equal(
        disk.tokenize(list(CT_PROMPTS), 77), mem.tokenize(list(CT_PROMPTS), 77)
    )
    monkeypatch.setenv("FOUNDDIFF_CLIP_BPE", FIXTURE_GZ)
    via_env = ClipTokenizer()
    assert via_env.encode(TEXTS[0]) == mem.encode(TEXTS[0])
    # prompt bootstrap through the file-loaded table: EOT derived, not assumed
    table = np.random.RandomState(0).randn(disk.vocab_size, 8).astype(np.float32)
    params, eot, _ = bootstrap_prompt_learner(table, disk)
    ids = disk.tokenize([" ".join(["X"] * 16) + " " + p for p in CT_PROMPTS], 77)
    assert eot == tuple(int(i) for i in ids.argmax(axis=-1))


@pytest.mark.skipif(
    not os.path.exists(
        os.environ.get(
            "FOUNDDIFF_CLIP_BPE",
            os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
        )
    ),
    reason="stock CLIP BPE vocab (external 1.3 MB asset) not in this "
    "environment; the gzip loading path itself is covered by "
    "test_gzip_bpe_file_loading",
)
def test_real_vocab_ct_prompts():
    """With the real merge table: the reference prompts' EOT positions and
    vocab size match the stock tokenizer's published behavior."""
    tok = ClipTokenizer()
    assert tok.vocab_size == 49408
    params, eot, _ = bootstrap_prompt_learner(
        np.zeros((tok.vocab_size, 8), np.float32), tok
    )
    assert eot[1] == eot[0] + 1  # second prompt is one token longer
