"""CLI production run: N model years of the coupled model with the
full observability loop (tsi stream, tavg netCDF, restarts, audits).

Usage:
    python scripts/run_production.py [--years N] [--outdir DIR]
        [--bgc none|npzd|mobi] [--dtype float32|float64] [--restart]

Reference analog: submitting run/mk-built UVic with control.in's
runlen/segtim and the &diagn intervals (UVic_ESCM.F:296-416).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=1.0)
    ap.add_argument("--outdir", default="run_out")
    ap.add_argument("--bgc", default="none",
                    choices=["none", "npzd", "mobi"])
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--restart", action="store_true",
                    help="resume from OUTDIR/restart.npz")
    ap.add_argument("--tsiint", type=float, default=10.0)
    ap.add_argument("--timavgint", type=float, default=360.0)
    ap.add_argument("--restint", type=float, default=360.0)
    ap.add_argument("--earth", action="store_true",
                    help="flagship earth configuration (earth_config "
                         "+ real-Earth topography)")
    ap.add_argument("--from-restart", default=None,
                    help="seed the initial state from this .npz "
                         "(e.g. a spinup checkpoint)")
    args = ap.parse_args()

    import dataclasses

    from uvic_tpu.config import ModelConfig, earth_config, mobi_full
    from uvic_tpu.coupler.driver import CoupledModel
    from uvic_tpu.coupler.run import Run

    if args.earth:
        cfg = earth_config(dtype=args.dtype)
    else:
        cfg = ModelConfig().replace(dtype=args.dtype)
    cfg = cfg.replace(time=dataclasses.replace(
        cfg.time, tsiint=args.tsiint, timavgint=args.timavgint,
        restint=args.restint))
    if args.bgc == "mobi":
        cfg = cfg.replace(bgc=mobi_full())
    elif args.bgc == "npzd":
        from uvic_tpu.config import BgcConfig
        cfg = cfg.replace(bgc=BgcConfig(
            suite="npzd", carbon=True, alk=True, o2=True, nitrogen=True))

    model = CoupledModel(cfg, topo_kind="earth" if args.earth
                         else "world")
    run = Run(model, args.outdir, log=lambda m: print(m, flush=True))
    state = model.init_state()
    if args.restart:
        state = run.load(state)
        print(f"resumed at {run.tm.stamp()}")
    elif args.from_restart:
        import json
        import os

        from uvic_tpu.io.restart import load_restart
        state = load_restart(args.from_restart, state)
        # ADVICE r4: restore the seasonal phase too — a mid-season
        # spinup checkpoint restarted at year-start would see a
        # season/state mismatch transient
        metap = os.path.join(os.path.dirname(args.from_restart),
                             "restart_meta.json")
        if os.path.exists(metap):
            with open(metap) as f:
                relyr = json.load(f).get("relyr")
            if relyr is not None:
                model.relyr = relyr
                run.tm.days = relyr * run.tm.yrlen
        print(f"seeded from {args.from_restart}")

    yrlen = 360.0 if cfg.time.eqyear else 365.0
    t0 = time.perf_counter()
    state = run.run(state, days=args.years * yrlen)
    wall = time.perf_counter() - t0
    print(f"done: {args.years} model years in {wall:.1f}s wall "
          f"({args.years / (wall / 86400.0):.1f} model-years/day)")


if __name__ == "__main__":
    sys.exit(main())
