"""One-model-year f32-vs-f64 validation of the coupled earth config
(VERDICT r3 #7: the -r8 precision contract, run/mk.ver:41-45).

Runs the flagship coupled configuration for one model year at the
given dtype on CPU (the platform is forced so both dtypes use the
same arithmetic) and writes the per-segment tsi-style scalar stream;
`compare` mode reports the divergence between two streams.

Usage:
  python scripts/precision_year.py run float32 out32.json [years]
  python scripts/precision_year.py run float64 out64.json [years]
  python scripts/precision_year.py compare out32.json out64.json
"""

import json
import sys

sys.path.insert(0, ".")


def run(dtype, out, years=1.0):
    import os
    os.environ.setdefault("XLA_FLAGS", "")
    import jax
    jax.config.update("jax_platforms", "cpu")
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import numpy as np
    import jax.numpy as jnp
    from uvic_tpu.config import earth_config
    from uvic_tpu.coupler.driver import CoupledModel

    cfg = earth_config(dtype=dtype)
    m = CoupledModel(cfg, topo_kind="earth")
    g = m.grid
    area = (np.asarray(g.cst)[:, None] * np.asarray(g.dyt)[:, None]
            * np.asarray(g.dxt)[None, :])
    area[:, 0] = 0.0
    area[:, -1] = 0.0
    tmsk = np.asarray(m.embm.tmsk)
    oarea = area * tmsk
    dvol = (np.asarray(g.dzt)[:, None, None] * area[None]
            * np.asarray(m.ocean.tmask))

    state = m.init_state()
    rows = []
    nseg = int(round(years * 365.0 / cfg.time.segtim_days))
    for s in range(nseg):
        state = m.run_segment(state)
        m.relyr += cfg.time.segtim_days / 365.0
        sst = np.asarray(state.ocean.t[0, 0], np.float64)
        sat = np.asarray(state.atm.at[0], np.float64)
        t3 = np.asarray(state.ocean.t[0], np.float64)
        rows.append(dict(
            seg=s + 1,
            sat_gm=float((sat * area).sum() / area.sum()),
            sst_gm=float((sst * oarea).sum() / oarea.sum()),
            heat=float((t3 * dvol).sum() / dvol.sum()),
            psi_max=float(np.abs(np.asarray(state.ocean.psi0,
                                            np.float64)).max()) / 1e12,
            ice=float((np.asarray(state.ice.aice, np.float64)
                       * oarea).sum()) / 1e16,
        ))
        if not np.isfinite(rows[-1]["sst_gm"]):
            raise SystemExit(f"non-finite at segment {s+1}")
    with open(out, "w") as f:
        json.dump(dict(dtype=dtype, rows=rows), f)
    print("wrote", out, flush=True)


def compare(a_path, b_path):
    import numpy as np
    a = json.load(open(a_path))
    b = json.load(open(b_path))
    keys = ("sat_gm", "sst_gm", "heat", "psi_max", "ice")
    out = {}
    n = min(len(a["rows"]), len(b["rows"]))
    for k in keys:
        va = np.array([r[k] for r in a["rows"][:n]])
        vb = np.array([r[k] for r in b["rows"][:n]])
        scale = max(np.abs(vb).max(), 1e-30)
        d = np.abs(va - vb)
        out[k] = dict(max_abs=float(d.max()),
                      final_abs=float(d[-1]),
                      max_rel=float(d.max() / scale),
                      final_rel=float(d[-1] / scale))
    print(json.dumps(dict(segments=n, a=a["dtype"], b=b["dtype"],
                          divergence=out), indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run(sys.argv[2], sys.argv[3],
            float(sys.argv[4]) if len(sys.argv) > 4 else 1.0)
    else:
        compare(sys.argv[2], sys.argv[3])
