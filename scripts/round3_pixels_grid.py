"""Round-3 pixels-in policy comparison (VERDICT item 7): the full
image pipeline (render → CLAHE → LK → selector → estimator) for
anticipate/quality/random on MH_05, 2 seeds each. Sequential (one core
peer-runs with the other background evidence jobs)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anticipated_vins_mono_tpu.utils.jaxenv import force_cpu_f64  # noqa: E402

force_cpu_f64()

# optionally wait for a predecessor artifact (frees CPU cores)
wait_for = sys.argv[1] if len(sys.argv) > 1 else None
if wait_for:
    for _ in range(240):
        if os.path.exists(wait_for) and os.path.getsize(wait_for) > 2:
            break
        time.sleep(30)

from anticipated_vins_mono_tpu.utils.image_benchmark import (  # noqa: E402
    run_image_benchmark)

OUT = "results/r3/image_policy.json"
rows = []
if os.path.exists(OUT) and os.path.getsize(OUT) > 2:
    rows = json.load(open(OUT))
done = {(r["policy"], r.get("seed", 0)) for r in rows}
for policy in ("anticipate", "quality", "random"):
    for seed in (0, 1):
        if (policy, seed) in done:
            continue
        row = run_image_benchmark("MH_05_difficult", 45.0, policy, 30,
                                  seed=seed)
        row["seed"] = seed
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump(rows, f, indent=1)
print("PIXELS_GRID_DONE")
