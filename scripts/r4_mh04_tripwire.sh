#!/bin/bash
# MH_04 full-length with the speed tripwire ENABLED (default 10 m/s):
# VERDICT r3 item 5 "Done" condition — holds <=1 m or visibly reboots and
# recovers, all four policies, multiple seeds. Chained after the stage-B/C
# grid (round4_cpu_grid.sh) to keep the 4-core host at 2 workers.
set -x
cd /root/repo
export JAX_PLATFORMS=cpu
while kill -0 "$1" 2>/dev/null; do sleep 120; done
python -m anticipated_vins_mono_tpu.utils.benchmark \
  --sequences MH_04_difficult \
  --policies anticipate quality random None \
  --kappas 30 --full-length \
  --track-loss 0.5 --quality-noise-scale 1.5 --slip-rate 0.2 \
  --degrade-after 8 --real-extrinsics \
  --seeds 0 1 2 3 4 --workers 2 \
  --out /tmp/avm_r4_mh04 --json-out results/r4/mh04_tripwire.json
echo MH04_TRIPWIRE_DONE
