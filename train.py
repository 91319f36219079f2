"""CLI entry point (reference train.py:1-183 equivalent).

Flags mirror the reference argparse block (train.py:36-43) plus ``--data_root``
(the reference's ``folder`` variable is referenced but never defined,
train.py:134 — fixed here as an explicit flag; dataset roots were hardcoded
at src/DADiff.py:1579-1588).

Examples:
  python train.py --name FoundDiff --is_train
  python train.py --name FoundDiff --epoch 400 --dataset 2020_seen
"""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="FoundDiff TPU training/testing")
    p.add_argument("--name", type=str, required=True, help="experiment name")
    p.add_argument("--is_train", action="store_true")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--sampling_timesteps", type=int, default=2)
    p.add_argument("--epoch", type=int, default=100, help="checkpoint milestone to load")
    p.add_argument(
        "--dataset",
        type=str,
        default="2020_seen",
        choices=["2020_seen", "2020_unseen", "2016_unseen"],
    )
    p.add_argument("--train_num_steps", type=int, default=200000)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--data_root", type=str, default="/mnt/miah203/zhchen")
    p.add_argument("--debug", action="store_true")
    p.add_argument(
        "--original_ddim_ddpm",
        action="store_true",
        help="vanilla DDPM/DDIM baseline path (reference train.py:59)",
    )
    p.add_argument("--no_dose_encoder", action="store_true")
    p.add_argument("--num_unet", type=int, default=1)
    p.add_argument("--objective", type=str, default="pred_res")
    p.add_argument("--test_res_or_noise", type=str, default="res")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--dim", type=int, default=64,
                   help="UNet base width (reference train.py:98; shrink for "
                        "CPU smoke runs)")
    p.add_argument("--dim_mults", type=str, default="1,2,4,8",
                   help="comma-separated UNet width multipliers")
    p.add_argument("--scan_impl", type=str, default="auto",
                   choices=["auto", "pallas_fused", "pallas", "chunked",
                            "ref"],
                   help="selective-scan backend (auto: Pallas on TPU, "
                        "chunked XLA elsewhere; 'ref' compiles fastest for "
                        "CPU smoke runs)")
    p.add_argument(
        "--mesh_data", type=int, default=0,
        help="data-parallel mesh axis size (0 = auto: all devices / seq)",
    )
    p.add_argument("--torch_checkpoint", type=str, default="",
                   help="load a reference PyTorch model-<n>.pt")
    return p.parse_args(argv)


def build_config(opt):
    from founddiff_tpu.config import Config

    cfg = Config()
    cfg.name = opt.name
    cfg.model.original_ddim_ddpm = opt.original_ddim_ddpm
    cfg.model.use_dose_encoder = (
        not opt.no_dose_encoder and not opt.original_ddim_ddpm
    )
    cfg.model.num_unet = opt.num_unet
    cfg.model.dim = opt.dim
    cfg.model.dim_mults = tuple(int(m) for m in opt.dim_mults.split(","))
    cfg.model.scan_impl = opt.scan_impl
    cfg.model.objective = opt.objective
    cfg.model.test_res_or_noise = opt.test_res_or_noise
    if opt.original_ddim_ddpm:
        cfg.model.condition = False
    cfg.diffusion.image_size = opt.image_size
    cfg.diffusion.sampling_timesteps = opt.sampling_timesteps
    cfg.train.train_num_steps = opt.train_num_steps
    cfg.train.train_batch_size = opt.train_batch_size
    cfg.train.checkpoint_folder = os.path.join("checkpoints", opt.name)
    cfg.data.root = opt.data_root
    if opt.debug:
        cfg.train.save_and_sample_every = 2
        cfg.diffusion.sampling_timesteps = min(
            cfg.diffusion.sampling_timesteps, 10
        )
        # don't clobber an explicitly shorter run
        cfg.train.train_num_steps = min(cfg.train.train_num_steps, 200)
    return cfg


def main(argv=None):
    # honor JAX_PLATFORMS even when a sitecustomize registered a TPU plugin
    # at interpreter start and latched the platform (the env var alone is
    # ignored after that; see tests/conftest.py for the same dance)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    opt = parse_args(argv)
    cfg = build_config(opt)

    from founddiff_tpu.data import Mayo16Dataset, PDFDataset
    from founddiff_tpu.factory import build
    from founddiff_tpu.parallel import init_distributed, make_mesh
    from founddiff_tpu.train import Trainer
    from founddiff_tpu.utils.logger import get_logger

    os.makedirs(cfg.train.checkpoint_folder, exist_ok=True)

    # distributed: rendezvous (multi-host), then a ('data','seq') mesh when
    # more than one device is visible or an explicit layout was configured
    # (the reference's accelerate-DDP analogue, src/DADiff.py:1546-1552)
    init_distributed()
    import jax

    mesh = None
    n_dev = len(jax.devices())
    if opt.mesh_data or cfg.mesh.seq_axis > 1 or n_dev > 1:
        data = opt.mesh_data or (
            cfg.mesh.data_axis if cfg.mesh.data_axis > 0 else None
        )
        mesh = make_mesh(data=data, seq=cfg.mesh.seq_axis)

    diffusion, model, params = build(cfg)

    if opt.is_train:
        train_ds = PDFDataset(
            cfg.data.train_phase,
            root=cfg.data.root,
            subset=cfg.data.subset,
            doses=cfg.data.doses,
            num=cfg.data.num,
            stride=cfg.data.stride,
        )
        test_ds = PDFDataset(
            cfg.data.test_phase,
            root=cfg.data.root,
            subset=cfg.data.subset,
            doses=cfg.data.doses,
            num=cfg.data.num,
            stride=cfg.data.stride,
        )
        trainer = Trainer(diffusion, params, cfg, train_dataset=train_ds,
                          sample_dataset=test_ds, model=model, mesh=mesh)
        if opt.torch_checkpoint:
            trainer.load_torch(opt.torch_checkpoint)
        trainer.train()
        return

    # test path (reference train.py:161-182)
    if opt.dataset == "2016_unseen":
        test_ds = Mayo16Dataset("test", root=cfg.data.root)
        suffix = "test_final_2016"
    elif opt.dataset == "2020_unseen":
        test_ds = PDFDataset(
            cfg.data.test_phase, root=cfg.data.root, subset=cfg.data.subset,
            doses=(3, 5, 8, 20), num=cfg.data.num, stride=cfg.data.stride,
        )
        suffix = "test_final_unseen"
    else:
        test_ds = PDFDataset(
            cfg.data.test_phase, root=cfg.data.root, subset=cfg.data.subset,
            doses=cfg.data.doses, num=cfg.data.num, stride=cfg.data.stride,
        )
        suffix = "test_final"

    trainer = Trainer(diffusion, params, cfg, sample_dataset=test_ds,
                      model=model)
    if opt.torch_checkpoint:
        trainer.load_torch(opt.torch_checkpoint)
    else:
        trainer.load(opt.epoch)
    out_dir = os.path.join(cfg.train.checkpoint_folder, suffix + "_npy")
    os.makedirs(out_dir, exist_ok=True)
    trainer.train_logger = get_logger(
        os.path.join(cfg.train.checkpoint_folder, suffix + ".log")
    )
    trainer.results_folder = out_dir
    trainer.test(last=True, save_npy=True)


if __name__ == "__main__":
    main()
