"""Convert a spinup/acceptance JSONL log into earth_run.json.

earth_run.json is the committed climate-credibility artifact (VERDICT
r3 #1): annual-mean SAT/SST/ice/MOC/psi/TOA series plus drift summary
over the last N years.

Usage: python scripts/make_earth_run_json.py LOG.jsonl OUT.json [last_n]
"""

import json
import sys

import numpy as np


def main(log_path, out_path, last_n=50):
    rows = [json.loads(l) for l in open(log_path) if l.startswith("{")]
    rows = rows[-last_n:]
    years = [r["year"] for r in rows]

    def series(k):
        return np.array([r[k] for r in rows], dtype=float)

    sat = series("sat_gm")
    # linear drift over the window [degC/decade]
    t = np.asarray(years, dtype=float)
    drift = float(np.polyfit(t, sat, 1)[0] * 10.0)
    summary = dict(
        years=len(rows),
        year_range=[years[0], years[-1]],
        yearly=rows,
        sat_drift_degC_per_decade=round(drift, 4),
        sat_mean=round(float(sat.mean()), 3),
        sst_mean=round(float(series("sst_gm").mean()), 3),
        toa_mean_wm2=round(float(series("toa_gm").mean()), 3),
        ice_nh_min_mean=round(float(series("ice_nh_min").mean()), 2),
        ice_nh_max_mean=round(float(series("ice_nh_max").mean()), 2),
        ice_sh_min_mean=round(float(series("ice_sh_min").mean()), 2),
        ice_sh_max_mean=round(float(series("ice_sh_max").mean()), 2),
        psi_max_mean_sv=round(float(series("psi_max").mean()), 1),
        moc_max_mean_sv=round(float(series("moc_max").mean()), 1),
        moc_min_mean_sv=round(float(series("moc_min").mean()), 1),
        perennial_ice_nh=bool(series("ice_nh_min").min() > 0.5),
        perennial_ice_sh=bool(series("ice_sh_min").min() > 0.5),
    )
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "yearly"}, indent=1))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 50)
