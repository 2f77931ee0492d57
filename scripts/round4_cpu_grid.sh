#!/bin/bash
# Round-4 CPU evidence runs (VERDICT r3 items 4/6/8): sequential stages under
# nohup, 2 workers each (the 4-core host also carries the loop-drift run and
# interactive TPU work). Regime = RESULTS.md §2 degradation.
set -x
cd /root/repo
export JAX_PLATFORMS=cpu
mkdir -p results/r4
REG="--kappas 10 --seconds 60 --track-loss 0.5 --quality-noise-scale 1.5 --slip-rate 0.2 --degrade-after 8 --real-extrinsics"

# --- stage A: GT-horizon control cells where anticipate lost/tied with the
# IMU horizon (VERDICT r3 next 4): does a valid horizon flip the result?
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences V1_02_medium V2_01_easy MH_05_difficult V1_03_difficult V2_02_medium \
  --policies anticipate --hgen gt $REG \
  --seeds 0 1 2 3 4 5 6 7 --workers 2 \
  --out /tmp/avm_r4_gt --json-out results/r4/sep_k10_gt_cells.json

# --- stage B: full-length grid statistical power (VERDICT r3 next 6):
# seeds 2-4 on the 6 non-MH_04 sequences (MH_04 reruns after the
# failure-detector fix, all 5 seeds, separately).
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences MH_05_difficult V1_02_medium V1_03_difficult V2_01_easy V2_02_medium V2_03_difficult \
  --policies anticipate quality random None \
  --kappas 30 --full-length \
  --track-loss 0.5 --quality-noise-scale 1.5 --slip-rate 0.2 \
  --degrade-after 8 --real-extrinsics \
  --seeds 2 3 4 --workers 2 \
  --out /tmp/avm_r4_grid --json-out results/r4/grid_full_s234.json

# --- stage C: td slow-motion bias (VERDICT r3 next 8): MH_05 full length
# (111 s) so the fast segments get enough weight to pull td off the prior.
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences MH_05_difficult --policies anticipate \
  --kappas 30 --full-length --real-extrinsics \
  --cam-td 0.005 --estimate-td --clean-velocity --seeds 0 1 --workers 2 \
  --out /tmp/avm_r4_td --json-out results/r4/td_recovery_full.json

echo ROUND4_CPU_GRID_DONE
