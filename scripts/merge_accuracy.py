"""Merge per-run lines from parallel evaluate_ntimes jobs into one
ACCURACY_r04.json (the loop rows' N runs were split across processes
with --seed0 to fit the round's wall clock; aggregates here match the
harness's own nan-aware avg/med computation).

Usage: python scripts/merge_accuracy.py OUT log1 [log2 ...]
"""

import json
import re
import sys

import numpy as np

LOOP_FRAMES_PER_LAP = 180
LINE = re.compile(r"^(\w+) run (\d+): (.+)$")


def main():
    out_path = sys.argv[1]
    rows = {}
    for path in sys.argv[2:]:
        for line in open(path):
            m = LINE.match(line.strip())
            if not m:
                continue
            sc = m.group(1)
            vals = {}
            for kv in m.group(3).split():
                k, v = kv.split("=")
                vals[k] = float(v)
            rows.setdefault(sc, []).append(vals)

    table = {}
    order = ["stereo", "stereo_async", "rgbd", "mono", "stereo_vio",
             "vieo", "veo", "multicam_kb8", "multicam4_kb8",
             "stereo_loop", "mono_loop", "vio_loop"]
    for sc in order + [s for s in rows if s not in order]:
        if sc not in rows:
            continue
        rs = rows[sc]
        agg = {"image_level": True, "n_runs": len(rs)}
        if sc.endswith("_loop"):
            agg["frames"] = 360
            agg["laps"] = round(360 / LOOP_FRAMES_PER_LAP, 2)
        for k in rs[0]:
            vals = np.asarray([r.get(k, float("nan")) for r in rs])
            agg[f"avg_{k}"] = round(float(np.nanmean(vals)), 4)
            agg[f"med_{k}"] = round(float(np.nanmedian(vals)), 4)
        table[sc] = agg

    meta = {"n_runs": 5, "frames": 60, "loop_frames": 360,
            "loop_frames_per_lap": LOOP_FRAMES_PER_LAP,
            "loop_world": "outward circle r=1.5, room 8x6x3 m, 2 laps",
            "renderer_hardening": {
                "noise_sigma": 2.0,
                "brightness_drift": "gain 1±0.10, bias ±8",
                "dynamic_landmark_frac": 0.02,
                "rgbd_depth_outlier_frac": 0.07},
            "loop_row_columns": {
                "rmse_preLC/rmse_postLC": "keyframe ATE immediately "
                "before/after the FIRST loop correction (the closure's "
                "own cut, separate from the final-GBA A/B)"}}
    with open(out_path, "w") as f:
        json.dump({"meta": meta, "scenarios": table}, f, indent=1)
    for sc, agg in table.items():
        print(sc, {k: agg[k] for k in agg if k.startswith(("avg_", "n_"))})


if __name__ == "__main__":
    main()
