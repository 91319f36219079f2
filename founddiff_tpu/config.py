"""Dataclass config system.

The reference scatters its knobs across argparse flags (train.py:33-45),
hardcoded constants (train.py:48-119), and Trainer defaults
(src/DADiff.py:1506-1552).  Here every knob lives in one typed config tree
with the reference's shipped values as defaults.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass
class ModelConfig:
    dim: int = 64
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 1
    num_unet: int = 1
    objective: str = "pred_res"  # train.py:81
    test_res_or_noise: str = "res"  # train.py:82
    condition: bool = True
    input_condition: bool = False
    input_condition_mask: bool = False
    self_condition: bool = False
    resnet_block_groups: int = 8
    learned_variance: bool = False
    base_d_state: int = 4
    ssm_expand: float = 2.0
    scan_impl: str = "auto"
    # vanilla lucidrains path (train.py:59,85-95)
    original_ddim_ddpm: bool = False
    # Dose-CLIP tower
    use_dose_encoder: bool = True
    clip_backbone: str = "RN50"


@dataclasses.dataclass
class DiffusionConfig:
    image_size: int = 512  # train.py:73
    timesteps: int = 1000  # train.py:109
    sampling_timesteps: int = 2  # train.py:39
    loss_type: str = "l2"  # train.py:112
    sum_scale: float = 0.01  # train.py:71
    ddim_sampling_eta: float = 0.0
    # 'use_pred_noise' (shipped) | 'use_x_start' (reference src/DADiff.py:
    # 1343-1349 local-constant variant)
    ddim_update: str = "use_pred_noise"
    convert_to_ddim: bool = True
    clip_denoised: bool = True


@dataclasses.dataclass
class TrainConfig:
    train_num_steps: int = 200000  # train.py:41
    train_batch_size: int = 2  # train.py:43
    gradient_accumulate_every: int = 2  # train.py:139
    train_lr: float = 2e-4  # train.py:137
    adam_betas: Tuple[float, float] = (0.9, 0.99)  # src/DADiff.py:1596-1597
    max_grad_norm: float = 1.0  # src/DADiff.py:1707
    ema_decay: float = 0.995  # train.py:140
    ema_update_every: int = 10
    save_and_sample_every: int = 1000  # train.py:53
    num_samples: int = 1  # train.py:70
    seed: int = 10  # train.py:27
    mixed_precision: str = "no"  # 'no' | 'bf16' (reference runs fp32)
    checkpoint_folder: str = "checkpoints/FoundDiff"
    keep_checkpoints: int = 3  # older milestone dirs are pruned (0 = keep all)
    # in-training FID at the periodic-eval cadence (the reference calls
    # test(FID=True) + an external FID script, src/DADiff.py:1731-1747)
    fid_eval: bool = True
    # optional wandb mirror of metrics.jsonl (reference src/DADiff.py:1575)
    use_wandb: bool = False
    wandb_project: str = "founddiff_tpu"


@dataclasses.dataclass
class DataConfig:
    root: str = "/mnt/miah203/zhchen"
    dataset: str = "pdf"  # 'pdf' | 'mayo16'
    train_phase: str = "train512"
    test_phase: str = "test"
    subset: str = "multi"
    doses: Tuple[int, ...] = (2, 4, 6, 10)
    num: int = 3000
    stride: int = 2
    num_workers: int = 4
    # per-anatomy eval slice counts (reference src/DADiff.py:1918-1945)
    eval_counts: Tuple[Tuple[str, int], ...] = (
        ("ab", 290),
        ("lung", 637),
        ("head", 159),
    )
    eval_doses: int = 4


@dataclasses.dataclass
class MeshConfig:
    data_axis: int = -1  # -1: all devices on the data axis
    seq_axis: int = 1  # sequence-sharded scan axis size


@dataclasses.dataclass
class Config:
    name: str = "FoundDiff"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = dataclasses.field(default_factory=DiffusionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)

        def build(klass, d):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in d.items():
                if k not in fields:
                    continue
                f = fields[k]
                if dataclasses.is_dataclass(f.type) or f.name in (
                    "model", "diffusion", "train", "data", "mesh"
                ):
                    sub = {
                        "model": ModelConfig,
                        "diffusion": DiffusionConfig,
                        "train": TrainConfig,
                        "data": DataConfig,
                        "mesh": MeshConfig,
                    }[f.name]
                    kwargs[k] = build(sub, v)
                elif isinstance(v, list):
                    kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
                else:
                    kwargs[k] = v
            return klass(**kwargs)

        return build(cls, raw)


def debug_config() -> Config:
    """Tiny config analogous to the reference's ``debug=True`` branch
    (train.py:48-57)."""
    cfg = Config()
    cfg.train.save_and_sample_every = 2
    cfg.diffusion.sampling_timesteps = 10
    cfg.train.train_num_steps = 200
    return cfg
