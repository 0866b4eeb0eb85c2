"""Convert a spinup/acceptance JSONL log into earth_run.json.

earth_run.json is the committed climate-credibility artifact (VERDICT
r3 #1): annual-mean SAT/SST/ice/MOC/psi/TOA series plus drift summary
over the last N years.

Integrity rules (VERDICT r4 #1 — the r4 artifact silently interleaved
two restart branches and its drift headline was a polyfit artifact):

- the selected window must be STRICTLY CONTIGUOUS: year[i+1] ==
  year[i] + 1 for every row, else the script refuses;
- if rows carry a ``run_id`` (written by spinup_earth.py since r5),
  the window must hold exactly ONE run id: a last-write-wins stitch
  across branches is refused (resume a lineage with the same
  --run-id, or pick --end-year inside one branch);
- if rows carry ``accel``, the window must be unaccelerated
  (accel == 1.0) unless --allow-accel is passed;
- the drift is recomputed from the emitted yearly series itself, so a
  reviewer can verify it from the artifact alone.

Usage: python scripts/make_earth_run_json.py LOG.jsonl OUT.json [last_n]
       [--end-year Y] [--allow-accel]
"""

import json
import sys

import numpy as np


def select_window(rows, last_n, end_year=None, allow_accel=False):
    """Pick the trailing contiguous window of ``last_n`` yearly rows
    ending at ``end_year`` (default: the newest year in the log).
    Rows from overlapping restart branches are resolved by taking the
    LAST row logged for each year (the newest branch), then the window
    must chain year-by-year with no gaps."""
    by_year = {}
    for r in rows:
        by_year[int(r["year"])] = r     # last write wins
    if end_year is None:
        end_year = max(by_year)
    window = []
    for y in range(end_year - last_n + 1, end_year + 1):
        if y not in by_year:
            raise SystemExit(
                f"refusing: year {y} missing — window "
                f"[{end_year - last_n + 1}, {end_year}] is not "
                "contiguous in the log")
        window.append(by_year[y])
    years = [int(r["year"]) for r in window]
    if any(b - a != 1 for a, b in zip(years, years[1:])):
        raise SystemExit("refusing: non-monotonic year sequence")
    accels = {r.get("accel", 1.0) for r in window}
    if not allow_accel and any(a != 1.0 for a in accels):
        raise SystemExit(
            f"refusing: window contains accelerated years ({accels}); "
            "pass --allow-accel to override")
    run_ids = {r.get("run_id", "untagged") for r in window}
    if len(run_ids) > 1:
        raise SystemExit(
            f"refusing: window mixes runs {sorted(run_ids)} — a "
            "last-write-wins stitch across branches is exactly the r4 "
            "interleaving failure; pick --end-year inside one branch")
    return window


def main(log_path, out_path, last_n=50, end_year=None,
         allow_accel=False):
    rows = [json.loads(l) for l in open(log_path) if l.startswith("{")]
    rows = select_window(rows, last_n, end_year, allow_accel)
    years = [r["year"] for r in rows]

    def series(k):
        return np.array([r[k] for r in rows], dtype=float)

    sat = series("sat_gm")
    # linear drift over the window [degC/decade] — recomputable from
    # the emitted yearly series
    t = np.asarray(years, dtype=float)
    drift = float(np.polyfit(t, sat, 1)[0] * 10.0)
    summary = dict(
        years=len(rows),
        year_range=[years[0], years[-1]],
        run_ids=sorted({r.get("run_id", "untagged") for r in rows}),
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
    for k in ("moc_max_exeq", "moc_min_exeq", "moc_res_max",
              "moc_res_min", "amoc_sv", "toa_audit_resid_wm2"):
        if all(k in r for r in rows):
            summary[k + "_mean"] = round(float(series(k).mean()), 2)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "yearly"}, indent=1))


if __name__ == "__main__":
    argv = sys.argv[1:]
    end_year = None
    allow_accel = False
    pos = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--end-year":
            end_year = int(argv[i + 1])
            i += 2
        elif a == "--allow-accel":
            allow_accel = True
            i += 1
        else:
            pos.append(a)
            i += 1
    main(pos[0], pos[1],
         int(pos[2]) if len(pos) > 2 else 50,
         end_year=end_year, allow_accel=allow_accel)
