"""Dose-CLIP training entry point.

The reference ships the frozen ``Dose-CLIP.pth`` tower plus its training
*data* pipeline (``DoseDataset`` — two augmentations of a slice + its dose
label, reference data/dose_dataset.py:80-90) and the BMC
contrastive-regression loss (reference src/util.py:293-316), but not the
training script itself.  This provides that capability: fine-tunes the
CLIPIQA prompt context + heads so that

- the dose head separates dose levels (BMC loss between the dose logits of
  the two augmented views, anchored by the dose label), and
- the content head is augmentation-invariant (InfoNCE between views).

The CLIP backbone stays frozen (as in CLIP-IQA+ prompt learning).

Usage:
  python tools/train_doseclip.py --data_root /path/to/mayo --steps 10000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--phase", default="train512")
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--out", default="checkpoints/dose_clip")
    p.add_argument("--bmc_sigma", type=float, default=1.0)
    p.add_argument(
        "--clip_weights",
        default=None,
        help="torch CLIP/CLIPIQA checkpoint (.pt/.pth) to convert into the "
        "frozen towers; prompts are then bootstrapped from its "
        "token-embedding table via the BPE tokenizer (reference "
        "src/DACLIP.py:906-926) instead of random init",
    )
    p.add_argument(
        "--bpe_path",
        default=None,
        help="bpe_simple_vocab_16e6.txt.gz path (default: $FOUNDDIFF_CLIP_BPE "
        "or ~/.cache/clip/)",
    )
    args = p.parse_args()

    from founddiff_tpu.data import DoseDataset, Loader, cycle
    from founddiff_tpu.models.clip import CLIPIQA
    from founddiff_tpu.ops.losses import bmc_loss
    from founddiff_tpu.utils.logger import get_logger

    os.makedirs(args.out, exist_ok=True)
    logger = get_logger(os.path.join(args.out, "train.log"))

    ds = DoseDataset(args.phase, root=args.data_root)
    loader = cycle(Loader(ds, batch_size=args.batch_size, shuffle=True))

    model = CLIPIQA()
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)))["params"]

    if args.clip_weights:
        # 1) convert the pretrained CLIP tower; 2) bootstrap the prompt
        # buffers from its token-embedding table + the real BPE tokenizer
        # (the reference's PromptLearner init, src/DACLIP.py:906-926)
        import numpy as np

        from founddiff_tpu.models.tokenizer import (
            ClipTokenizer,
            bootstrap_prompt_learner,
        )
        from founddiff_tpu.utils.torch_convert import (
            Converter,
            _apply,
            _to_numpy_state,
            convert_clip,
            load_torch_file,
        )

        sd = _to_numpy_state(load_torch_file(args.clip_weights))
        prefix = "clip_model" if any(
            k.startswith("clip_model.") for k in sd
        ) else ""
        c = Converter(sd)
        convert_clip(c, "clip_model", prefix or "clip_model",
                     with_token_embedding=False)
        params, applied = _apply(params, c.out)
        logger.info("converted %d CLIP tensors from %s",
                    applied, args.clip_weights)

        table_key = (prefix + "." if prefix else "") + "token_embedding.weight"
        tok = ClipTokenizer(bpe_path=args.bpe_path)
        prompt_params, eot, _ = bootstrap_prompt_learner(
            np.asarray(sd[table_key]), tok
        )
        expected = model.prompt_eot_indices
        if tuple(eot) != tuple(expected):
            raise SystemExit(
                f"tokenized prompt EOT positions {eot} != model config "
                f"{expected}; pass matching prompt_eot_indices to CLIPIQA"
            )
        pl = dict(params["prompt_learner"])
        pl.update({k: jnp.asarray(v) for k, v in prompt_params.items()})
        params = dict(params, prompt_learner=pl)
        logger.info("bootstrapped prompt buffers from token table, eot=%s", eot)

    # trainable: prompt ctx + heads; frozen: the CLIP towers
    def trainable_mask(params):
        return {
            k: (
                jax.tree_util.tree_map(lambda _: k != "clip_model", v)
                if isinstance(v, dict)
                else k != "clip_model"
            )
            for k, v in params.items()
        }

    tx = optax.multi_transform(
        {True: optax.adam(args.lr), False: optax.set_to_zero()},
        trainable_mask(params),
    )
    opt_state = tx.init(params)
    noise_sigma = jnp.asarray(args.bmc_sigma)

    def loss_fn(params, batch, rng):
        (v1, v2), labels = batch
        x1 = jnp.repeat(v1 * 2.0 - 1.0, 3, axis=-1)
        x2 = jnp.repeat(v2 * 2.0 - 1.0, 3, axis=-1)
        p1, d1, c1 = model.apply({"params": params}, x1)
        p2, d2, c2 = model.apply({"params": params}, x2)
        # dose regression: dose probability should track 1/label
        target = (1.0 / labels)[:, None]
        reg = jnp.mean((p1 - target) ** 2 + (p2 - target) ** 2)
        # contrastive alignment of dose embeddings across views
        bmc = bmc_loss(d1, d2, noise_sigma**2)
        # content invariance: InfoNCE over content features
        logits = c1 @ c2.T / 0.07
        labels_idx = jnp.arange(c1.shape[0])
        nce = -jnp.mean(
            jax.nn.log_softmax(logits, axis=-1)[labels_idx, labels_idx]
        )
        return reg + bmc + nce, {"reg": reg, "bmc": bmc, "nce": nce}

    @jax.jit
    def step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    for i in range(args.steps):
        batch = next(loader)
        rng, srng = jax.random.split(rng)
        params, opt_state, loss, aux = step(params, opt_state, batch, srng)
        if i % 50 == 0:
            logger.info(
                f"step {i}: loss {float(loss):.4f} "
                + " ".join(f"{k}={float(v):.4f}" for k, v in aux.items())
            )

    import orbax.checkpoint as ocp

    ocp.PyTreeCheckpointer().save(
        os.path.abspath(os.path.join(args.out, "dose_clip_final")), params,
        force=True,
    )
    logger.info("done")


if __name__ == "__main__":
    main()
