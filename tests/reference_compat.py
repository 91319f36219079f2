"""Hermetic import of the reference PyTorch code for golden parity tests.

The reference (`/root/reference/src/DADiff.py`, `src/DACLIP.py`,
`src/emamba2.py`) imports a long tail of GPU-era dependencies that are not
installed here (wandb, timm, torchvision, open_clip, lpips, kornia, ...) and
a CUDA extension (`selective_scan_cuda_core`).  This module installs minimal
``sys.modules`` stubs — including a float64 torch recurrence standing in for
the CUDA selective-scan kernel — so the *actual reference model code* can be
instantiated and run on CPU and compared number-for-number against this
framework's Flax rebuild + checkpoint converter.

Nothing here is imported by the library; test-only.
"""

from __future__ import annotations

import hashlib
import sys
import types
from contextlib import ExitStack
from unittest import mock

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"

# vocab size of the stock CLIP BPE tokenizer; the fake tokenizer below keeps
# SOS/EOS as the two highest ids so ``ids.argmax(-1)`` recovers the EOT
# position exactly like the real one (reference src/DACLIP.py:967)
FAKE_VOCAB = 49408


def fake_tokenize(texts, context_length: int = 77):
    """Deterministic stand-in for ``clip.tokenize`` (one id per whitespace
    word).  Token *values* are meaningless — parity tests only push them
    through an (also random) embedding table on both sides."""
    if isinstance(texts, str):
        texts = [texts]
    out = torch.zeros(len(texts), context_length, dtype=torch.long)
    for i, text in enumerate(texts):
        ids = [
            int(hashlib.md5(w.encode()).hexdigest(), 16) % (FAKE_VOCAB - 3) + 1
            for w in text.lower().split()
        ]
        toks = [FAKE_VOCAB - 2] + ids + [FAKE_VOCAB - 1]
        assert len(toks) <= context_length
        out[i, : len(toks)] = torch.tensor(toks)
    return out


def naive_selective_scan_fwd(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False, nrows=1
):
    """Float64 sequential recurrence with the exact call signature of
    ``selective_scan_cuda_core.fwd`` (reference src/emamba2.py:151-155).

    u, delta: [B, K*D, L]; A: [K*D, N]; B, C: [B, K, N, L];
    D, delta_bias: [K*D].  Returns (out [B, K*D, L], saved_state_placeholder).
    """
    Bsz, KD, L = u.shape
    K = B.shape[1]
    Dd = KD // K
    N = A.shape[1]
    d = delta.double()
    if delta_bias is not None:
        d = d + delta_bias.view(1, KD, 1).double()
    if delta_softplus:
        d = F.softplus(d)
    d = d.view(Bsz, K, Dd, L)
    uu = u.double().view(Bsz, K, Dd, L)
    Av = A.double().view(K, Dd, N)
    Bv, Cv = B.double(), C.double()
    h = torch.zeros(Bsz, K, Dd, N, dtype=torch.float64)
    ys = []
    for t in range(L):
        dl = d[..., t]  # [B, K, Dd]
        h = torch.exp(dl.unsqueeze(-1) * Av.unsqueeze(0)) * h + (
            dl * uu[..., t]
        ).unsqueeze(-1) * Bv[..., t].unsqueeze(2)
        ys.append(torch.einsum("bkdn,bkn->bkd", h, Cv[..., t]))
    y = torch.stack(ys, dim=-1).reshape(Bsz, KD, L)
    if D is not None:
        y = y + D.view(1, KD, 1).double() * u.double()
    out = y.to(u.dtype)
    return out, out  # (out, saved-x placeholder; backward unused in tests)


def _mk_module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    m = types.ModuleType(name)
    # a real ModuleSpec keeps importlib.util.find_spec() probes working
    # (transformers probes for 'datasets' and crashes on spec-less stubs)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    m.__path__ = []  # mark as package so submodule stubs resolve
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install_stubs() -> None:
    global _installed
    if _installed:
        return
    _installed = True

    class _DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, **kw):
            super().__init__()

        def forward(self, x):
            return x

    class _EMA(nn.Module):
        pass

    _mk_module("wandb", init=lambda *a, **k: None, log=lambda *a, **k: None)
    _mk_module("Augmentor")
    _mk_module("ipdb", set_trace=lambda *a, **k: None)
    class _LPIPS(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _mk_module("lpips", LPIPS=_LPIPS)
    _mk_module("ema_pytorch", EMA=_EMA)
    _mk_module(
        "open_clip",
        create_model_from_pretrained=lambda *a, **k: (None, None),
        get_tokenizer=lambda *a, **k: None,
    )
    timm = _mk_module("timm")
    timm_models = _mk_module("timm.models")
    _mk_module(
        "timm.models.layers",
        DropPath=_DropPath,
        trunc_normal_=torch.nn.init.trunc_normal_,
    )
    _mk_module("timm.models.registry", register_model=lambda f: f)
    timm.models = timm_models

    tv = _mk_module("torchvision")
    tv.transforms = _mk_module("torchvision.transforms", Compose=list)
    _mk_module("torchvision.transforms.functional")
    tv.utils = _mk_module(
        "torchvision.utils", save_image=lambda *a, **k: None
    )
    _mk_module("pywt", Wavelet=object, wavedec2=lambda *a, **k: None)
    kornia = _mk_module("kornia")
    kornia.filters = _mk_module(
        "kornia.filters",
        get_gaussian_kernel2d=lambda *a, **k: None,
        filter2d=lambda *a, **k: None,
    )
    # the reference's own data/dataset packages (unused by model parity)
    _mk_module("datasets")
    _mk_module("datasets.get_dataset", dataset=object)
    _mk_module("data")
    _mk_module("data.pdf_dataset", PDFDataset=object)
    # OpenAI clip package: only `tokenize` is used (src/DACLIP.py:874,912)
    _mk_module("clip", tokenize=fake_tokenize)
    # CUDA selective scan -> float64 torch recurrence
    core = types.SimpleNamespace(fwd=naive_selective_scan_fwd)
    _mk_module("selective_scan_vmamba_pt202", selective_scan_cuda_core=core)
    _mk_module("selective_scan_vmamba", selective_scan_cuda_core=core)
    _mk_module("selective_scan_cuda", fwd=naive_selective_scan_fwd)


def import_reference():
    """Returns (DADiff, DACLIP, emamba2) reference modules."""
    install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.DACLIP as DACLIP  # noqa
    import src.DADiff as DADiff  # noqa
    import src.emamba2 as emamba2  # noqa

    return DADiff, DACLIP, emamba2


# micro Dose-CLIP tower config used by parity tests on both sides
# (embed_dim must stay 1024: the reference CLIPIQA heads hardcode
# Linear(1024, ...), src/DACLIP.py:1179-1188)
MICRO_CLIP_TORCH = dict(
    embed_dim=1024,
    image_resolution=64,
    vision_layers=(1, 1, 1, 1),
    vision_width=8,
    vision_patch_size=None,
    context_length=77,
    vocab_size=FAKE_VOCAB,
    transformer_width=32,
    transformer_heads=4,
    transformer_layers=2,
)


def micro_clip_overrides(eot_indices):
    """The matching FoundDiffDenoiser ``clip_overrides`` tuple."""
    return (
        ("vision_layers", (1, 1, 1, 1)),
        ("vision_width", 8),
        ("embed_dim", 1024),
        ("transformer_width", 32),
        ("transformer_layers", 2),
        ("transformer_heads", 4),
        ("backbone_resolution", 64),
        ("prompt_eot_indices", tuple(int(i) for i in eot_indices)),
    )


def build_micro_clipiqa(DACLIP, seed: int = 0):
    """A random micro CLIPIQA (reference module, hermetic construction)."""
    torch.manual_seed(seed)
    clip_model = DACLIP.CLIP(**MICRO_CLIP_TORCH)
    with mock.patch.object(DACLIP, "load", lambda *a, **k: clip_model):
        iq = DACLIP.CLIPIQA(model_type="clipiqa+", pretrained=False)
    iq.eval()
    return iq


def build_reference_unetres(DADiff, clipiqa, **unet_kwargs):
    """Reference ``UnetRes`` with its ctor-time CLIP loads patched to the
    given hermetic tower (the ctor hardcodes ``condition=True`` and loads
    RN50 + Dose-CLIP.pth from disk/network, src/DADiff.py:588-600)."""
    with ExitStack() as es:
        es.enter_context(
            mock.patch.object(DADiff, "load", lambda *a, **k: clipiqa.clip_model)
        )
        es.enter_context(
            mock.patch.object(DADiff, "CLIPIQA", lambda *a, **k: clipiqa)
        )
        es.enter_context(
            mock.patch.object(
                torch, "load", lambda *a, **k: clipiqa.state_dict()
            )
        )
        net = DADiff.UnetRes(**unet_kwargs)
    net.eval()
    return net


def state_dict_numpy(module: nn.Module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
