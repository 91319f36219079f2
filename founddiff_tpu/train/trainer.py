"""Trainer: jitted train step, EMA, periodic sampling/eval, Orbax checkpoints.

Functional rebuild of the reference ``Trainer`` (src/DADiff.py:1506-1971):

- the whole optimization step (grad-accum microbatch scan, summed per-unet
  losses, global-norm clip 1.0, Adam/RAdam, EMA blend) is ONE jitted XLA
  program with donated state — no host round-trips inside the hot loop
  (the reference does per-microbatch ``backward`` + barriers,
  src/DADiff.py:1689-1720);
- sampling/eval run the DDIM ``lax.scan`` sampler under jit with the
  EMA parameters and (for test) the ``init()`` schedule variant;
- checkpoints are Orbax pytrees {step, params, opt_state, ema}
  (analogue of the torch dict at src/DADiff.py:1626-1646).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from founddiff_tpu.config import Config
from founddiff_tpu.data.loader import Loader, cycle
from founddiff_tpu.diffusion.residual import ResidualDiffusion
from founddiff_tpu.ops.metrics import compute_psnr, compute_rmse, compute_ssim
from founddiff_tpu.train.ema import ema_update
from founddiff_tpu.train.state import TrainState, make_optimizer
from founddiff_tpu.utils.images import hu_preview_window, save_image
from founddiff_tpu.utils.logger import get_logger


def make_dir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


class Trainer:
    """Drives training/eval of a (residual) diffusion process.

    Args:
      diffusion: process whose ``model_fn`` is bound to a Flax apply.
      params: initial parameter pytree.
      config: full Config.
      train_dataset / sample_dataset: map-style datasets yielding
        ``[NDCT, LDCT]`` HWC pairs (None for sampling-only use).
    """

    def __init__(
        self,
        diffusion: ResidualDiffusion,
        params,
        config: Config,
        train_dataset=None,
        sample_dataset=None,
        mesh=None,
        model=None,
    ):
        self.diffusion = diffusion
        self.model = model  # enables tower hoisting in sample/test
        self.config = config
        tcfg = config.train
        self.checkpoint_folder = tcfg.checkpoint_folder
        self.results_folder = os.path.join(self.checkpoint_folder, "sample")
        make_dir(self.results_folder)

        self.num_unet = config.model.num_unet
        self.tx = make_optimizer(
            num_unet=self.num_unet,
            lr=tcfg.train_lr,
            adam_betas=tuple(tcfg.adam_betas),
            max_grad_norm=tcfg.max_grad_norm,
        )
        self.state = TrainState.create(params, self.tx)
        self.mesh = mesh
        # multi-host: only process 0 writes checkpoints/samples/metrics
        # (reference gates on accelerator.is_main_process,
        # src/DADiff.py:1627,1723,1766)
        self.is_main = jax.process_index() == 0
        if mesh is not None:
            from founddiff_tpu.parallel import replicate_state

            self.state = replicate_state(self.state, mesh)

        self.train_dataset = train_dataset
        self.sample_dataset = sample_dataset
        if train_dataset is not None:
            self.dl = cycle(
                Loader(
                    train_dataset,
                    batch_size=tcfg.train_batch_size
                    * tcfg.gradient_accumulate_every,
                    shuffle=True,
                    seed=tcfg.seed,
                )
            )
        if sample_dataset is not None:
            self.sample_loader = cycle(
                Loader(
                    sample_dataset,
                    batch_size=tcfg.num_samples,
                    shuffle=True,
                    seed=tcfg.seed + 1,
                )
            )

        self.rng = jax.random.PRNGKey(tcfg.seed)
        self.train_logger = None
        self._jit_cache: Dict[str, Any] = {}
        from founddiff_tpu.utils.metrics_log import MetricsLogger

        self.metrics = MetricsLogger(
            os.path.join(self.checkpoint_folder, "metrics.jsonl"),
            use_wandb=tcfg.use_wandb and self.is_main,
            project=tcfg.wandb_project,
            name=config.name,
        )

        self._train_step = jax.jit(self._step_fn, donate_argnums=(0,))

    def _is_conditional(self) -> bool:
        return getattr(self.diffusion, "condition", False)

    # ------------------------------------------------------------------
    # One optimization step (jitted).
    # ------------------------------------------------------------------

    def _step_fn(self, state: TrainState, batch, rng):
        tcfg = self.config.train
        accum = tcfg.gradient_accumulate_every
        gt, ld = batch
        micro = gt.shape[0] // accum
        gt = gt.reshape(accum, micro, *gt.shape[1:])
        ld = ld.reshape(accum, micro, *ld.shape[1:])
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), accum)

        # bf16 compute / fp32 master weights: params and denoiser inputs are
        # cast at the model boundary (grads flow back to the fp32 masters
        # through the cast); schedules/losses stay fp32.  The reference
        # plumbs mixed precision but ships it off (src/DADiff.py:1550).
        diffusion = self.diffusion
        bf16 = tcfg.mixed_precision == "bf16"
        if bf16:
            import copy as _copy

            diffusion = _copy.copy(self.diffusion)
            base_fn = self.diffusion.model_fn

            def bf16_fn(p, x_in, time, x_self_cond=None):
                out = base_fn(
                    p,
                    x_in.astype(jnp.bfloat16),
                    time,
                    None if x_self_cond is None
                    else x_self_cond.astype(jnp.bfloat16),
                )
                return [
                    o.astype(jnp.float32) if hasattr(o, "astype") else o
                    for o in out
                ]

            diffusion.model_fn = bf16_fn

        def loss_fn(params, g, l, r):
            if bf16:
                params = jax.tree_util.tree_map(
                    lambda p: p.astype(jnp.bfloat16)
                    if p.dtype == jnp.float32 else p,
                    params,
                )
            if self._is_conditional():
                losses = diffusion.loss(params, r, [g, l])
            else:
                # generation path: train on the (single) image stream
                # (reference src/DADiff.py:1691-1694)
                losses = [diffusion.loss(params, r, g)]
            # per-unet losses averaged over accumulation
            # (reference src/DADiff.py:1700-1705)
            total = sum(losses) / accum
            return total, jnp.stack(losses)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, xs):
            grads_acc, losses_acc = carry
            g, l, r = xs
            (_, losses), grads = grad_fn(state.params, g, l, r)
            grads_acc = jax.tree_util.tree_map(
                lambda a, b: a + b, grads_acc, grads
            )
            return (grads_acc, losses_acc + losses / accum), None

        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, losses), _ = jax.lax.scan(
            body, (zero_grads, jnp.zeros((self.num_unet,))), (gt, ld, rngs)
        )

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(
            state.ema,
            params,
            beta=tcfg.ema_decay,
            update_every=tcfg.ema_update_every,
        )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema
        )
        metrics = {f"loss_unet{i}": losses[i] for i in range(self.num_unet)}
        return new_state, metrics

    # ------------------------------------------------------------------
    # Training loop (reference src/DADiff.py:1673-1763).
    # ------------------------------------------------------------------

    def train(self, log_every: int = 50, profile_dir: Optional[str] = None,
              profile_steps: tuple = (10, 15)):
        """Training loop.  ``profile_dir`` captures a ``jax.profiler`` trace
        over ``profile_steps`` (the observability hook the reference lacks —
        SURVEY.md §5 'Tracing/profiling: none')."""
        tcfg = self.config.train
        self.train_logger = get_logger(
            os.path.join(self.checkpoint_folder, "train.log")
        )
        self.rng, step_rng = jax.random.split(self.rng)
        t0 = time.time()
        while int(self.state.step) < tcfg.train_num_steps:
            if profile_dir and int(self.state.step) == profile_steps[0]:
                jax.profiler.start_trace(profile_dir)
            if profile_dir and int(self.state.step) == profile_steps[1]:
                jax.profiler.stop_trace()
            batch = next(self.dl)
            if self.mesh is not None:
                from founddiff_tpu.parallel import shard_batch

                with self.mesh:
                    self.state, metrics = self._train_step(
                        self.state, shard_batch(tuple(batch), self.mesh),
                        step_rng,
                    )
            else:
                self.state, metrics = self._train_step(
                    self.state, tuple(batch), step_rng
                )
            step = int(self.state.step)

            if (step % log_every == 0 or step == 1) and self.is_main:
                m = {k: float(v) for k, v in metrics.items()}
                rate = log_every / max(time.time() - t0, 1e-9)
                t0 = time.time()
                self.train_logger.info(
                    f"step {step}/{tcfg.train_num_steps} "
                    + " ".join(f"{k}: {v:.6f}" for k, v in m.items())
                    + f" ({rate:.2f} it/s)"
                )
                self.metrics.log({**m, "it_per_sec": rate}, step=step)

            if step != 0 and step % tcfg.save_and_sample_every == 0:
                milestone = step // tcfg.save_and_sample_every
                if self.sample_dataset is not None:
                    self.sample(milestone)
                # periodic full eval + save (reference src/DADiff.py:1731-1747)
                if (
                    step > tcfg.save_and_sample_every * 10 * 4
                    and step % (tcfg.save_and_sample_every * 10) == 0
                ):
                    self.save(milestone)
                    # the reference runs test(FID=True) + shells out to the
                    # FID script at this cadence (src/DADiff.py:1731-1747);
                    # here FID is computed inline from the frozen Dose-CLIP
                    # features
                    self.test(last=True, fid=tcfg.fid_eval)
        if self.train_logger:
            self.train_logger.info("training complete")

    # ------------------------------------------------------------------
    # Checkpointing (reference src/DADiff.py:1626-1671).
    # ------------------------------------------------------------------

    def _ckpt_path(self, milestone) -> str:
        return os.path.abspath(
            os.path.join(self.results_folder, f"model-{milestone}")
        )

    def save(self, milestone) -> None:
        if not self.is_main:
            return
        import orbax.checkpoint as ocp

        path = self._ckpt_path(milestone)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, self.state, force=True)
        with open(path + ".config.json", "w") as f:
            f.write(self.config.to_json())
        self._prune_checkpoints()

    def _prune_checkpoints(self) -> None:
        """Keep only the newest ``keep_checkpoints`` milestones (the
        reference config carries the knob but never prunes)."""
        keep = self.config.train.keep_checkpoints
        if keep <= 0:
            return
        import glob
        import re
        import shutil

        entries = []
        for p in glob.glob(os.path.join(self.results_folder, "model-*")):
            m = re.fullmatch(r"model-(\d+)", os.path.basename(p))
            if m and os.path.isdir(p):
                entries.append((int(m.group(1)), p))
        for _, p in sorted(entries)[:-keep]:
            shutil.rmtree(p, ignore_errors=True)
            cfg_json = p + ".config.json"
            if os.path.exists(cfg_json):
                os.remove(cfg_json)

    def load(self, milestone) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_path(milestone)
        ckptr = ocp.PyTreeCheckpointer()
        self.state = ckptr.restore(path, item=self.state)
        print(f"load model - {path}")

    def load_torch(self, path: str) -> None:
        """Load a reference PyTorch ``model-<n>.pt`` checkpoint via the
        state-dict converter (capability: checkpoint-compatible weights)."""
        from founddiff_tpu.utils.torch_convert import load_reference_checkpoint

        self.state = load_reference_checkpoint(path, self.state, self.config)

    # ------------------------------------------------------------------
    # Sampling preview (reference src/DADiff.py:1765-1815).
    # ------------------------------------------------------------------

    def _sample_fn(self, use_test_schedule: bool):
        key = f"sample_{use_test_schedule}"
        if key not in self._jit_cache:
            hoistable = self.model is not None and hasattr(self.model, "encode")
            if self._is_conditional() and hoistable:
                # frozen Dose-CLIP tower computed once per slice, not per step
                from founddiff_tpu.pipeline import make_hoisted_sampler

                fn = make_hoisted_sampler(
                    self.model, self.diffusion,
                    use_test_schedule=use_test_schedule,
                )
            elif self._is_conditional():

                def fn(params, rng, x_input):
                    out = self.diffusion.sample(
                        params,
                        rng,
                        x_input,
                        last=True,
                        use_test_schedule=use_test_schedule,
                    )
                    return out[-1]

            else:

                def fn(params, rng, x_input):
                    del x_input
                    return self.diffusion.sample(
                        params, rng, batch_size=self.config.train.num_samples
                    )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def sample(self, milestone, last: bool = True):
        batch = next(self.sample_loader)
        # condition_type == 2: drop GT, feed LDCT (reference src/DADiff.py:1776-1781)
        x_input = jnp.asarray(batch[1])
        self.rng, rng = jax.random.split(self.rng)
        img = self._sample_fn(False)(self.state.ema.params, rng, x_input)
        if self.is_main:
            preview = hu_preview_window(np.asarray(img))
            save_image(
                preview,
                os.path.join(self.results_folder, f"sample-{milestone}.png"),
                nrow=int(max(1, np.sqrt(self.config.train.num_samples))),
            )
        return img

    # ------------------------------------------------------------------
    # Full test protocol (reference src/DADiff.py:1817-1966).
    # ------------------------------------------------------------------

    def _compute_fid(self, preds, gts) -> float:
        """FID between predicted and ground-truth slices using the frozen
        Dose-CLIP visual tower as the feature extractor (the reference's
        in-training hook shells out to fid_and_inception_score.py, which is
        absent from its repo — src/DADiff.py:1746-1747)."""
        params = self.state.ema.params
        dose_params = params.get("dose_encoder") if hasattr(params, "get") else None
        if dose_params is None:
            if self.train_logger and self.is_main:
                self.train_logger.info(
                    "fid skipped: no dose_encoder params (unconditional run)"
                )
            return float("nan")
        from founddiff_tpu.models.clip import CLIPIQA
        from founddiff_tpu.utils.fid import compute_fid, make_clip_extractor

        overrides = dict(getattr(self.model, "clip_overrides", ()) or ())
        tower = CLIPIQA(**overrides)
        extractor = make_clip_extractor(dose_params, tower)
        return compute_fid(
            np.concatenate(preds, axis=0), np.concatenate(gts, axis=0),
            extractor,
        )

    def test(self, last: bool = True, save_npy: bool = False,
             fid: bool = False, fid_limit: int = 512) -> Dict[str, float]:
        # The reference gates the whole eval on the main process
        # (src/DADiff.py:1723-1760), which is safe under torch DDP.  With
        # JAX multi-process meshes every process must participate in any jit
        # computation, so ALL processes run the compute here and only
        # filesystem writes / logging are gated on is_main.
        assert self.sample_dataset is not None
        logger = None
        if self.is_main:
            logger = self.train_logger or get_logger(
                os.path.join(self.checkpoint_folder, "test.log")
            )
        sample_fn = self._sample_fn(True)  # ema_model.init() schedule

        metric_fn = self._jit_cache.setdefault(
            "metrics",
            jax.jit(
                lambda a, b: (
                    compute_psnr(a, b),
                    compute_ssim(a, b),
                    compute_rmse(a, b),
                )
            ),
        )

        psnrs: List[float] = []
        ssims: List[float] = []
        rmses: List[float] = []
        fid_pred: List[np.ndarray] = []
        fid_gt: List[np.ndarray] = []
        loader = Loader(
            self.sample_dataset, batch_size=1, shuffle=False, drop_last=False
        )
        self.rng, rng = jax.random.split(self.rng)
        for i, items in enumerate(loader):
            gt, ldct = jnp.asarray(items[0]), jnp.asarray(items[1])
            rng, srng = jax.random.split(rng)
            pred = sample_fn(self.state.ema.params, srng, ldct)
            p, s, r = metric_fn(pred, gt)
            psnrs.append(float(p))
            ssims.append(float(s))
            rmses.append(float(r))
            if fid and len(fid_pred) < fid_limit:
                fid_pred.append(np.asarray(pred))
                fid_gt.append(np.asarray(gt))
            if save_npy and self.is_main:
                name = self.sample_dataset.load_name(i)
                np.save(
                    os.path.join(self.results_folder, name[:-4]),
                    np.asarray(pred).reshape(pred.shape[1], pred.shape[2]),
                )

        # per-anatomy / per-dose aggregation (reference src/DADiff.py:1918-1952)
        counts = dict(self.config.data.eval_counts)
        n_doses = self.config.data.eval_doses
        offset = 0
        for anatomy, length in counts.items():
            block = slice(offset, offset + length * n_doses)
            a_p, a_s, a_r = psnrs[block], ssims[block], rmses[block]
            if a_p and self.is_main:
                logger.info(
                    "(%s average mean: psnr: %.4f, ssim: %.4f, rmse: %.4f)"
                    % (anatomy, np.mean(a_p), np.mean(a_s), np.mean(a_r))
                )
                for d in range(n_doses):
                    seg = slice(d * length, (d + 1) * length)
                    if a_p[seg]:
                        logger.info(
                            "(%s dose %2d: psnr: %.4f, ssim: %.4f, rmse: %.4f)"
                            % (
                                anatomy,
                                d,
                                np.mean(a_p[seg]),
                                np.mean(a_s[seg]),
                                np.mean(a_r[seg]),
                            )
                        )
            offset += length * n_doses

        summary = {
            "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
            "ssim": float(np.mean(ssims)) if ssims else float("nan"),
            "rmse": float(np.mean(rmses)) if rmses else float("nan"),
        }
        if fid and fid_pred:
            # Keyed ``fid_doseclip``, NOT ``fid``: the extractor is the frozen
            # Dose-CLIP visual tower (InceptionV3 weights cannot be downloaded
            # in an air-gapped environment, utils/fid.py:1-18), so the number
            # is not comparable to published Inception-feature FIDs.
            summary["fid_doseclip"] = float(self._compute_fid(fid_pred, fid_gt))
        if self.is_main:
            self.metrics.log(
                {f"test_{k}": v for k, v in summary.items()},
                step=int(self.state.step),
            )
            logger.info(
                "test_psnr: {psnr:.4f}, test_ssim: {ssim:.4f}, "
                "test_rmse: {rmse:.4f}".format(**summary)
            )
        return summary
