#!/bin/bash
# Round-3 CPU evidence runs (VERDICT items 5/6/9): run sequentially under
# nohup; each stage writes its own JSON into results/r3/.
# Regime = RESULTS.md §2 degradation (matches separation_k10.json rows).
set -x
cd /root/repo
export JAX_PLATFORMS=cpu
mkdir -p results/r3
REG="--kappas 10 --seconds 60 --track-loss 0.5 --quality-noise-scale 1.5 --slip-rate 0.2 --degrade-after 8 --real-extrinsics"

# --- stage A: kappa=10 separation, new sequences (VERDICT weak 1 / next 6)
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences V1_02_medium V2_01_easy V2_02_medium \
  --policies anticipate quality random $REG \
  --seeds 0 1 2 3 4 5 6 7 --workers 3 \
  --out /tmp/avm_r3_sep --json-out results/r3/sep_k10_new_seqs.json

# --- stage B: MH_05 extra seeds (8 more -> 16 total)
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences MH_05_difficult \
  --policies anticipate quality random $REG \
  --seeds 8 9 10 11 12 13 14 15 --workers 3 \
  --out /tmp/avm_r3_sep --json-out results/r3/sep_k10_mh05_more.json

# --- stage C: V1_03 + V2_03 extra seeds (4 more -> 8 total)
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences V1_03_difficult V2_03_difficult \
  --policies anticipate quality random $REG \
  --seeds 4 5 6 7 --workers 3 \
  --out /tmp/avm_r3_sep --json-out results/r3/sep_k10_v1v2_more.json

# --- stage C2: V2_03 GT-horizon anticipate extra seeds
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences V2_03_difficult --policies anticipate --hgen gt $REG \
  --seeds 4 5 6 7 --workers 3 \
  --out /tmp/avm_r3_sep --json-out results/r3/sep_k10_v203_gt_more.json

# --- stage D: td recovery (VERDICT next 9): true td=5ms, estimate it
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences MH_04_difficult MH_05_difficult --policies anticipate \
  --kappas 30 --seconds 60 --real-extrinsics \
  --cam-td 0.005 --estimate-td --seeds 0 1 --workers 3 \
  --out /tmp/avm_r3_td --json-out results/r3/td_recovery.json

# --- stage E: full-length grid, all 7 sequences, 4 policies, kappa=30,
#     SAME degradation regime (VERDICT next 5), 2 seeds
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --policies anticipate quality random None \
  --kappas 30 --full-length \
  --track-loss 0.5 --quality-noise-scale 1.5 --slip-rate 0.2 \
  --degrade-after 8 --real-extrinsics \
  --seeds 0 1 --workers 3 \
  --out /tmp/avm_r3_grid --json-out results/r3/grid_full.json

echo ROUND3_CPU_GRID_DONE
