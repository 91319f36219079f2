#!/usr/bin/env bash
# Example invocations (the reference documents its runs in main.sh).
set -e

DATA_ROOT=${DATA_ROOT:-/mnt/miah203/zhchen}

# --- training: shipped FoundDiff recipe (512^2, pred_res, L2, bs 2 x2 accum,
#     Adam 2e-4, EMA 0.995/10, clip 1.0, 200k steps) ---------------------------
python train.py --name FoundDiff --is_train \
    --train_num_steps 200000 --train_batch_size 2 --data_root "$DATA_ROOT"

# --- debug run (tiny steps, 10-step DDIM previews) ---------------------------
python train.py --name FoundDiff-debug --is_train --debug --data_root "$DATA_ROOT"

# --- evaluation on the three splits (2-step DDIM) ----------------------------
python train.py --name FoundDiff --epoch 400 --dataset 2020_seen   --data_root "$DATA_ROOT"
python train.py --name FoundDiff --epoch 400 --dataset 2020_unseen --data_root "$DATA_ROOT"
python train.py --name FoundDiff --epoch 400 --dataset 2016_unseen --data_root "$DATA_ROOT"

# --- evaluate directly from a reference PyTorch checkpoint -------------------
python train.py --name FoundDiff --dataset 2016_unseen --data_root "$DATA_ROOT" \
    --torch_checkpoint checkpoints/FoundDiff/sample/model-400.pt

# --- vanilla DDPM/DDIM baseline path (original_ddim_ddpm=True) ----------------
python train.py --name ddpm-baseline --is_train --original_ddim_ddpm \
    --image_size 128 --data_root "$DATA_ROOT"

# --- Dose-CLIP tower training -------------------------------------------------
python tools/train_doseclip.py --data_root "$DATA_ROOT" --steps 20000

# --- FID over saved predictions ----------------------------------------------
python fid_and_inception_score.py checkpoints/FoundDiff/test_final_npy \
    --reference_dir "$DATA_ROOT/Mayo2020_head_2d_2/test/full_1mm"

# --- offline metric sweeps (test.ipynb equivalent) ----------------------------
python tools/analyze_results.py checkpoints/FoundDiff/test_final_npy \
    "$DATA_ROOT/Mayo2020_head_2d_2/test/full_1mm" --export-figs figs/

# --- throughput benchmark ------------------------------------------------------
python bench.py                                   # DDIM-50 512^2 bf16
BENCH_STEPS=2 python bench.py                     # shipped 2-step config
BENCH_DTYPE=float32 python bench.py               # reference precision
