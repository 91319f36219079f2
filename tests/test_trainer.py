"""End-to-end smoke tests: tiny UNet + residual diffusion training steps,
EMA schedule, checkpoint save/load, sampling, and the test protocol —
BASELINE.json config 1 (tiny UNet, few-step DDIM, CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from founddiff_tpu.config import Config
from founddiff_tpu.factory import build
from founddiff_tpu.train import Trainer, ema_decay_schedule
from founddiff_tpu.train.ema import EmaState, ema_update


class SyntheticPairs:
    """[NDCT, LDCT] pairs with a constant residual."""

    def __init__(self, n=32, size=16):
        rng = np.random.RandomState(0)
        self.gt = rng.rand(n, size, size, 1).astype(np.float32) * 0.5 + 0.2
        self.ld = np.clip(self.gt + 0.1, 0, 1).astype(np.float32)

    def __len__(self):
        return len(self.gt)

    def __getitem__(self, i):
        return [self.gt[i], self.ld[i]]

    def load_name(self, i, sub_dir=False):
        return f"slice-{i}.npy"


def tiny_config(tmp_path) -> Config:
    cfg = Config()
    cfg.model.dim = 8
    cfg.model.dim_mults = (1, 2)
    cfg.model.use_dose_encoder = False
    cfg.model.scan_impl = "ref"
    cfg.diffusion.image_size = 16
    cfg.diffusion.timesteps = 20
    cfg.diffusion.sampling_timesteps = 2
    cfg.train.train_batch_size = 2
    cfg.train.gradient_accumulate_every = 2
    cfg.train.train_num_steps = 3
    cfg.train.save_and_sample_every = 1000
    cfg.train.num_samples = 1
    cfg.train.checkpoint_folder = str(tmp_path / "ckpt")
    return cfg


def test_train_steps_and_checkpoint(tmp_path):
    cfg = tiny_config(tmp_path)
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs()
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)

    batch = next(trainer.dl)
    # snapshot before stepping: the jitted step donates the state buffers
    params0 = jax.device_get(trainer.state.params)
    trainer.state, metrics = trainer._train_step(trainer.state, tuple(batch), trainer.rng)
    assert int(trainer.state.step) == 1
    assert np.isfinite(float(metrics["loss_unet0"]))
    # params actually changed
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))),
        jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - b, trainer.state.params, params0
        ),
        0.0,
    )
    assert diff > 0

    # loss decreases over a few steps on this trivial problem
    losses = []
    for _ in range(6):
        batch = next(trainer.dl)
        trainer.state, metrics = trainer._train_step(
            trainer.state, tuple(batch), trainer.rng
        )
        losses.append(float(metrics["loss_unet0"]))
    assert losses[-1] < losses[0] * 2  # sanity: no blow-up

    # checkpoint roundtrip
    trainer.save(1)
    step_before = int(trainer.state.step)
    params_before = jax.device_get(trainer.state.params)
    trainer.state = trainer.state.replace(step=jnp.asarray(999, jnp.int32))
    trainer.load(1)
    assert int(trainer.state.step) == step_before
    after = jax.device_get(trainer.state.params)
    jax.tree_util.tree_map(np.testing.assert_array_equal, params_before, after)


def test_sample_and_test_protocol(tmp_path):
    cfg = tiny_config(tmp_path)
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs(n=4)
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)
    img = trainer.sample(milestone=0)
    assert np.asarray(img).shape == (1, 16, 16, 1)
    assert os.path.exists(os.path.join(trainer.results_folder, "sample-0.png"))

    summary = trainer.test(last=True)
    assert np.isfinite(summary["psnr"])
    assert 0 <= summary["ssim"] <= 1


def test_ema_schedule():
    # copies until update_after_step, then ramps toward beta
    assert float(ema_decay_schedule(jnp.asarray(50))) == 0.0
    assert float(ema_decay_schedule(jnp.asarray(100))) == 0.0
    d200 = float(ema_decay_schedule(jnp.asarray(200)))
    d5000 = float(ema_decay_schedule(jnp.asarray(5000)))
    assert 0 < d200 < d5000 <= 0.995 + 1e-6

    # update_every gating: non-multiple steps leave ema unchanged
    params = {"w": jnp.ones(3)}
    ema = EmaState(params={"w": jnp.zeros(3)}, step=jnp.asarray(101, jnp.int32))
    out = ema_update(ema, params, update_every=10)
    np.testing.assert_array_equal(np.asarray(out.params["w"]), 0.0)  # 101 % 10 != 0
    ema = EmaState(params={"w": jnp.zeros(3)}, step=jnp.asarray(110, jnp.int32))
    out = ema_update(ema, params, update_every=10)
    assert float(out.params["w"][0]) > 0  # blended


def test_vanilla_path_builds(tmp_path):
    cfg = tiny_config(tmp_path)
    cfg.model.original_ddim_ddpm = True
    cfg.model.condition = False
    cfg.model.channels = 1
    diffusion, model, params = build(cfg)
    rng = jax.random.PRNGKey(0)
    loss = diffusion.loss(params, rng, jnp.zeros((2, 16, 16, 1)))
    assert np.isfinite(float(loss))


def test_vanilla_trainer_step(tmp_path):
    """Unconditional (generation) training path through the Trainer
    (reference original_ddim_ddpm branch, train.py:59,85-95)."""
    cfg = tiny_config(tmp_path)
    cfg.model.original_ddim_ddpm = True
    cfg.model.condition = False
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs(n=8)
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)
    batch = next(trainer.dl)
    trainer.state, metrics = trainer._train_step(
        trainer.state, tuple(batch), trainer.rng
    )
    assert np.isfinite(float(metrics["loss_unet0"]))
    img = trainer.sample(milestone=0)
    assert np.asarray(img).shape[1:] == (16, 16, 1)


def test_trainer_with_mesh_trains(tmp_path):
    """Trainer(mesh=...) on the virtual 8-device mesh: state auto-replicates,
    batches shard over 'data', loop runs (VERDICT: MeshConfig wired to CLI)."""
    from founddiff_tpu.parallel import make_mesh

    cfg = tiny_config(tmp_path)
    cfg.train.train_batch_size = 4  # divisible by data=4
    cfg.train.train_num_steps = 2
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs()
    mesh = make_mesh(data=4, seq=2, devices=jax.devices()[:8])
    trainer = Trainer(
        diffusion, params, cfg, train_dataset=ds, sample_dataset=ds, mesh=mesh
    )
    trainer.train(log_every=1)
    assert int(trainer.state.step) == 2


def test_non_main_process_writes_nothing(tmp_path, monkeypatch):
    """Multi-host gating: a process with index != 0 must not write
    checkpoints, sample pngs, result npys, or logs — but it MUST still run
    the jit compute (with JAX global meshes every process participates in
    every computation, unlike torch-DDP's main-only eval at reference
    src/DADiff.py:1627,1723 — see ADVICE r2)."""
    cfg = tiny_config(tmp_path)
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs()
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)
    assert not trainer.is_main
    trainer.save(1)
    assert not os.path.exists(trainer._ckpt_path(1))
    trainer.sample(1)
    assert not os.path.exists(
        os.path.join(trainer.results_folder, "sample-1.png")
    )
    summary = trainer.test(save_npy=True)
    # compute ran on this process (all-process participation) ...
    assert set(summary) == {"psnr", "ssim", "rmse"}
    # ... but nothing was written
    assert not os.path.exists(os.path.join(trainer.checkpoint_folder, "test.log"))
    import glob

    assert not glob.glob(os.path.join(trainer.results_folder, "*.npy"))


def test_checkpoint_pruning(tmp_path):
    """save() keeps only the newest keep_checkpoints milestones (the
    reference carries the knob but never prunes it)."""
    cfg = tiny_config(tmp_path)
    cfg.train.keep_checkpoints = 2
    diffusion, model, params = build(cfg)
    trainer = Trainer(diffusion, params, cfg)
    for i in (1, 2, 3, 4):
        trainer.save(i)
    assert not os.path.exists(trainer._ckpt_path(1))
    assert not os.path.exists(trainer._ckpt_path(2))
    assert os.path.exists(trainer._ckpt_path(3))
    assert os.path.exists(trainer._ckpt_path(4))
    assert os.path.exists(trainer._ckpt_path(4) + ".config.json")
    assert not os.path.exists(trainer._ckpt_path(1) + ".config.json")


def _micro_conditional_trainer(tmp_path, n_slices=6):
    from founddiff_tpu.diffusion import ResidualDiffusion
    from founddiff_tpu.models.founddiff import FoundDiffDenoiser
    from tests.test_pipeline import _MICRO_CLIP

    cfg = tiny_config(tmp_path)
    model = FoundDiffDenoiser(
        dim=8, dim_mults=(1, 2), channels=1, num_unet=1, condition=True,
        objective="pred_res", test_res_or_noise="res", scan_impl="ref",
        clip_overrides=_MICRO_CLIP,
    )

    def model_fn(params, x_in, time, x_self_cond=None):
        return model.apply({"params": params}, x_in, time, x_self_cond)

    diffusion = ResidualDiffusion(
        model_fn, image_size=16, channels=1, timesteps=20,
        sampling_timesteps=2, objective="pred_res", loss_type="l2",
        condition=True, sum_scale=0.01, test_res_or_noise="res",
    )
    x0 = jnp.zeros((1, 16, 16, 2))
    params = model.init(
        jax.random.PRNGKey(0), x0, [jnp.zeros((1,)), jnp.zeros((1,))]
    )["params"]
    ds = SyntheticPairs(n=n_slices)
    trainer = Trainer(
        diffusion, params, cfg, train_dataset=ds, sample_dataset=ds,
        model=model,
    )
    return trainer


def test_test_protocol_with_fid(tmp_path):
    """In-training FID (VERDICT r2 #4): test(fid=True) computes FID from the
    frozen Dose-CLIP features; identical inputs give FID ~ 0."""
    trainer = _micro_conditional_trainer(tmp_path)

    # FID(self) ~ 0 through the real micro tower
    rng = np.random.RandomState(0)
    xs = [rng.rand(1, 16, 16, 1).astype(np.float32) for _ in range(8)]
    self_fid = trainer._compute_fid(xs, xs)
    assert abs(self_fid) < 1e-2, self_fid

    summary = trainer.test(fid=True, fid_limit=6)
    # key is fid_doseclip (NOT fid): Dose-CLIP features, not InceptionV3 —
    # the label keeps the number from being quoted against published FIDs
    assert "fid_doseclip" in summary and "fid" not in summary
    assert (
        np.isfinite(summary["fid_doseclip"])
        and summary["fid_doseclip"] >= -1e-3
    )


def test_train_loop_fires_fid_eval(tmp_path, monkeypatch):
    """The periodic-eval hook fires test(fid=True) at the reference cadence
    (every 10 x save_and_sample_every after 40x, src/DADiff.py:1731-1747)."""
    cfg = tiny_config(tmp_path)
    cfg.train.save_and_sample_every = 1
    cfg.train.train_num_steps = 50
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs()
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)

    calls = []
    monkeypatch.setattr(trainer, "test", lambda **kw: calls.append(kw) or {})
    monkeypatch.setattr(trainer, "sample", lambda *a, **kw: None)
    monkeypatch.setattr(trainer, "save", lambda *a, **kw: None)
    trainer.train(log_every=1000)
    assert calls, "periodic eval hook never fired"
    assert calls[-1].get("fid") is True


def test_bf16_train_step(tmp_path):
    """bf16-compute/fp32-master mixed precision: step runs, loss finite,
    master params stay fp32, update direction tracks the fp32 step."""
    cfg = tiny_config(tmp_path)
    cfg.train.mixed_precision = "bf16"
    diffusion, model, params = build(cfg)
    ds = SyntheticPairs()
    trainer = Trainer(diffusion, params, cfg, train_dataset=ds, sample_dataset=ds)
    batch = next(trainer.dl)
    trainer.state, metrics = trainer._train_step(
        trainer.state, tuple(batch), trainer.rng
    )
    assert np.isfinite(float(metrics["loss_unet0"]))
    dtypes = {
        np.asarray(x).dtype
        for x in jax.tree_util.tree_leaves(trainer.state.params)
    }
    assert np.dtype("float32") in dtypes and np.dtype("bfloat16") not in dtypes
