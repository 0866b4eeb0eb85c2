/* Cross-language golden twin of the uvic_tpu tracer kernels.
 *
 * The evaluation image has no Fortran compiler, so the reference
 * trajectory cannot be produced directly.  This program is the
 * trajectory-level correctness anchor instead: an INDEPENDENT C
 * implementation of the exact discrete tracer-step specification the
 * JAX kernels implement (models/ocean/kernels.py tracer_step with the
 * centered scheme + const horizontal mixing + fully implicit vertical
 * diffusion, ops/tridiag.py invtri, ops/convection.py convct_ncon,
 * ops/stencil.py setbcx) — the shared spec being
 * source/mom/tracer.F:678-916, adv_vel.F:1-253, invtri.F:1-115,
 * convect.F:52-89, tracer_adv_flx.F:1007-1070, util.F:789-815.
 *
 * All geometry/metric factors, masks, EOS tables, velocities, ICs and
 * boundary fluxes are READ FROM A BINARY BLOB written by the test
 * (tests/test_c_golden.py), so both implementations consume bitwise
 * identical constants; the trajectories after N leapfrog steps must
 * then agree to accumulation-of-roundoff tolerance.
 *
 * Usage: ./tracer_golden input.bin output.bin
 * Blob layout (all little-endian): int32 header
 *   [nt, km, jmt, imt, nsteps, ncon, scheme, fct3d]
 *   scheme: 0 = centered, 1 = FCT dlm1, 2 = FCT dlm2
 *   (FCT: Zalesak flux-corrected transport, tracer_adv_flx.F:376-1005
 *    — upstream low-order solution + direction-split limited
 *    antidiffusive fluxes; fct3d adds the 3-D delimiter :880-977)
 * then float64 scalars [c2dtts, ah]
 * then float64 arrays in order (C row-major, shapes as noted):
 *   dxu(imt) dyu(jmt) csu(jmt) dxt2r(imt) dyt2r(jmt) dxtr(imt)
 *   dytr(jmt) cstr(jmt) dzt(km) cstdxt2r(jmt,imt) cstdyt2r(jmt)
 *   dzt2r(km) cstdxur(jmt,imt) cstdxtr(jmt,imt) ahc_north(jmt)
 *   ahc_south(jmt) dztr(km) dztur(km) dztlr(km) dtxcel(km) dztxcl(km)
 *   eos_c(km,9) eos_to(km) eos_so(km)
 *   kmt(jmt,imt)              [stored as float64, integral values]
 *   tmask(km,jmt,imt) diff_cbt(km,jmt,imt)
 *   u(km,jmt,imt) v(km,jmt,imt)
 *   stf(nt,jmt,imt) btf(nt,jmt,imt)
 *   t_tm1(nt,km,jmt,imt) t_tau(nt,km,jmt,imt)
 * Output blob: t_tau(nt,km,jmt,imt) after nsteps.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int NT, KM, JMT, IMT, NSTEPS, NCON, SCHEME, FCT3D;
static double C2DTTS, AH;
#define EPSLN 1.0e-20

#define I3(k, j, i) (((size_t)(k) * JMT + (j)) * IMT + (i))
#define I2(j, i) ((size_t)(j) * IMT + (i))
#define I4(n, k, j, i) ((((size_t)(n) * KM + (k)) * JMT + (j)) * IMT + (i))

static double *rd(FILE *f, size_t n) {
  double *p = malloc(n * sizeof(double));
  if (fread(p, sizeof(double), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(1);
  }
  return p;
}

/* setbcx cyclic wrap on the trailing axis (util.F:789-815) */
static void setbcx3(double *a, int lead) {
  for (int m = 0; m < lead; m++)
    for (int j = 0; j < JMT; j++) {
      double *row = a + ((size_t)m * JMT + j) * IMT;
      row[0] = row[IMT - 2];
      row[IMT - 1] = row[1];
    }
}

/* Zalesak FCT corrected 2x-fluxes for one tracer
 * (ops/advection.py fct_flux; tracer_adv_flx.F:376-1005).
 * tc = tracer at tau, tb = tracer at tau-1.  dtx[k] = c2dtts*dtxcel.
 * Outputs fe/fn/fb; the seven scratch arrays are caller-allocated n3.
 * dlm2 selects the O_fct_dlm2 low-order-neighbor extrema. */
static void fct_fluxes(const double *tc, const double *tb,
                       const double *vet, const double *vnt,
                       const double *vbt, const double *tmask,
                       const double *dtx, const double *cstdxt2r,
                       const double *cstdyt2r, const double *dzt2r,
                       double *fe, double *fn, double *fb, double *tlo,
                       double *afe, double *afn, double *afb,
                       double *rp, double *rm, double *tmx, double *tmn,
                       int dlm2) {
  size_t n3 = (size_t)KM * JMT * IMT;
  /* rp/rm each hold 3 direction slabs (x,y,z); tmx/tmn likewise */
  double *rpx = rp, *rpy = rp + n3, *rpz = rp + 2 * n3;
  double *rmx = rm, *rmy = rm + n3, *rmz = rm + 2 * n3;
  double *txx = tmx, *txy = tmx + n3, *txz = tmx + 2 * n3;
  double *tnx = tmn, *tny = tmn + n3, *tnz = tmn + 2 * n3;

#define EI(i) (((i) + 1) % IMT)
#define WI(i) (((i) - 1 + IMT) % IMT)
#define NJ(j) (((j) + 1) % JMT)
#define SJ(j) (((j) - 1 + JMT) % JMT)

  /* low-order upstream fluxes at tau-1 into fe/fn/fb */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double t0 = tb[I3(k, j, i)];
        double te = tb[I3(k, j, EI(i))], tn = tb[I3(k, NJ(j), i)];
        double td = k + 1 < KM ? tb[I3(k + 1, j, i)] : 0.0;
        double ve = vet[I3(k, j, i)], vn = vnt[I3(k, j, i)],
               vb = vbt[I3(k, j, i)];
        fe[I3(k, j, i)] = ve * (t0 + te) + fabs(ve) * (t0 - te);
        fn[I3(k, j, i)] = vn * (t0 + tn) + fabs(vn) * (t0 - tn);
        fb[I3(k, j, i)] =
            k == KM - 1 ? 0.0 : vb * (td + t0) + fabs(vb) * (td - t0);
      }

  /* low-order solution t_lo */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double ax = (fe[I3(k, j, i)] - fe[I3(k, j, WI(i))]) *
                    cstdxt2r[I2(j, i)];
        double ay = (fn[I3(k, j, i)] - fn[I3(k, SJ(j), i)]) *
                    cstdyt2r[j];
        double fup = k > 0 ? fb[I3(k - 1, j, i)] : 0.0;
        double az = (fup - fb[I3(k, j, i)]) * dzt2r[k];
        tlo[I3(k, j, i)] = tb[I3(k, j, i)] -
                           dtx[k] * (ax + ay + az) * tmask[I3(k, j, i)];
      }
  setbcx3(tlo, KM);

  /* raw antidiffusive fluxes: centered(tau) minus low-order */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double t0 = tc[I3(k, j, i)];
        double te = tc[I3(k, j, EI(i))], tn = tc[I3(k, NJ(j), i)];
        double td = k + 1 < KM ? tc[I3(k + 1, j, i)] : 0.0;
        afe[I3(k, j, i)] =
            vet[I3(k, j, i)] * (t0 + te) - fe[I3(k, j, i)];
        afn[I3(k, j, i)] =
            vnt[I3(k, j, i)] * (t0 + tn) - fn[I3(k, j, i)];
        afb[I3(k, j, i)] =
            k == KM - 1 ? 0.0
                        : vbt[I3(k, j, i)] * (t0 + td) -
                              fb[I3(k, j, i)] * tmask[I3(k, j, i)];
      }

  /* ---- x-direction delimiter ---- */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double lo = tlo[I3(k, j, i)];
        double mw = tmask[I3(k, j, WI(i))], me = tmask[I3(k, j, EI(i))];
        double fxa, fxb;
        if (dlm2) {
          fxa = mw * tlo[I3(k, j, WI(i))] + (1.0 - mw) * lo;
          fxb = me * tlo[I3(k, j, EI(i))] + (1.0 - me) * lo;
        } else {
          /* halfway(i) = 0.5*(t_tau(i-1)+t_tau(i)) at the west face */
          double hw_w = 0.5 * (tc[I3(k, j, WI(i))] + tc[I3(k, j, i)]);
          double hw_e = 0.5 * (tc[I3(k, j, i)] + tc[I3(k, j, EI(i))]);
          fxa = mw * hw_w + (1.0 - mw) * lo;
          fxb = me * hw_e + (1.0 - me) * lo;
        }
        double mx = fxa > fxb ? fxa : fxb;
        double mn = fxa < fxb ? fxa : fxb;
        txx[I3(k, j, i)] = mx > lo ? mx : lo;
        tnx[I3(k, j, i)] = mn < lo ? mn : lo;
        double aw = afe[I3(k, j, WI(i))], ac = afe[I3(k, j, i)];
        double dcf = dtx[k] * cstdxt2r[I2(j, i)];
        double pp = dcf * ((aw > 0 ? aw : 0) - (ac < 0 ? ac : 0));
        double pm = dcf * ((ac > 0 ? ac : 0) - (aw < 0 ? aw : 0));
        double qp = txx[I3(k, j, i)] - lo, qm = lo - tnx[I3(k, j, i)];
        double m0 = tmask[I3(k, j, i)];
        double r1 = m0 * qp / (pp + EPSLN), r2 = m0 * qm / (pm + EPSLN);
        rpx[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
        rmx[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
      }
  setbcx3(rpx, KM);
  setbcx3(rmx, KM);
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double cpos = rpx[I3(k, j, EI(i))] < rmx[I3(k, j, i)]
                          ? rpx[I3(k, j, EI(i))]
                          : rmx[I3(k, j, i)];
        double cneg = rpx[I3(k, j, i)] < rmx[I3(k, j, EI(i))]
                          ? rpx[I3(k, j, i)]
                          : rmx[I3(k, j, EI(i))];
        double a = afe[I3(k, j, i)];
        afe[I3(k, j, i)] =
            0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
      }

  /* ---- y-direction delimiter ---- */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double lo = tlo[I3(k, j, i)];
        double ms = tmask[I3(k, SJ(j), i)], mn_ = tmask[I3(k, NJ(j), i)];
        double fxa, fxb;
        if (dlm2) {
          fxa = ms * tlo[I3(k, SJ(j), i)] + (1.0 - ms) * lo;
          fxb = mn_ * tlo[I3(k, NJ(j), i)] + (1.0 - mn_) * lo;
        } else {
          double hw_s = 0.5 * (tc[I3(k, SJ(j), i)] + tc[I3(k, j, i)]);
          double hw_n = 0.5 * (tc[I3(k, j, i)] + tc[I3(k, NJ(j), i)]);
          fxa = ms * hw_s + (1.0 - ms) * lo;
          fxb = mn_ * hw_n + (1.0 - mn_) * lo;
        }
        double mx = fxa > fxb ? fxa : fxb;
        double mn2 = fxa < fxb ? fxa : fxb;
        txy[I3(k, j, i)] = mx > lo ? mx : lo;
        tny[I3(k, j, i)] = mn2 < lo ? mn2 : lo;
        double as = afn[I3(k, SJ(j), i)], ac = afn[I3(k, j, i)];
        double dcf = dtx[k] * cstdyt2r[j];
        double pp = dcf * ((as > 0 ? as : 0) - (ac < 0 ? ac : 0));
        double pm = dcf * ((ac > 0 ? ac : 0) - (as < 0 ? as : 0));
        double qp = txy[I3(k, j, i)] - lo, qm = lo - tny[I3(k, j, i)];
        double m0 = tmask[I3(k, j, i)];
        double r1 = m0 * qp / (pp + EPSLN), r2 = m0 * qm / (pm + EPSLN);
        rpy[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
        rmy[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
      }
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double cpos = rpy[I3(k, NJ(j), i)] < rmy[I3(k, j, i)]
                          ? rpy[I3(k, NJ(j), i)]
                          : rmy[I3(k, j, i)];
        double cneg = rpy[I3(k, j, i)] < rmy[I3(k, NJ(j), i)]
                          ? rpy[I3(k, j, i)]
                          : rmy[I3(k, NJ(j), i)];
        double a = afn[I3(k, j, i)];
        afn[I3(k, j, i)] =
            0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
      }

  /* ---- z-direction delimiter ---- */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double lo = tlo[I3(k, j, i)];
        double fxa, fxb;
        if (k == 0)
          fxa = lo;
        else {
          double mu = tmask[I3(k - 1, j, i)];
          double v = dlm2 ? tlo[I3(k - 1, j, i)]
                          : 0.5 * (tc[I3(k - 1, j, i)] + tc[I3(k, j, i)]);
          fxa = mu * v + (1.0 - mu) * lo;
        }
        if (k == KM - 1)
          fxb = lo;
        else {
          double md = tmask[I3(k + 1, j, i)];
          double v = dlm2 ? tlo[I3(k + 1, j, i)]
                          : 0.5 * (tc[I3(k, j, i)] + tc[I3(k + 1, j, i)]);
          fxb = md * v + (1.0 - md) * lo;
        }
        double mx = fxa > fxb ? fxa : fxb;
        double mn2 = fxa < fxb ? fxa : fxb;
        txz[I3(k, j, i)] = mx > lo ? mx : lo;
        tnz[I3(k, j, i)] = mn2 < lo ? mn2 : lo;
        double ac = afb[I3(k, j, i)];
        double au = k > 0 ? afb[I3(k - 1, j, i)] : 0.0;
        double dcf = dtx[k] * dzt2r[k];
        double pp = dcf * ((ac > 0 ? ac : 0) - (au < 0 ? au : 0));
        double pm = dcf * ((au > 0 ? au : 0) - (ac < 0 ? ac : 0));
        double qp = txz[I3(k, j, i)] - lo, qm = lo - tnz[I3(k, j, i)];
        double m0 = tmask[I3(k, j, i)];
        double r1 = m0 * qp / (pp + EPSLN), r2 = m0 * qm / (pm + EPSLN);
        rpz[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
        rmz[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
      }
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        /* face k lies between cells k (above) and k+1 (below);
           DN() zero-pads, so the bottom face uses 0 for the k+1 cell
           ratios — the flux there is zeroed below anyway */
        double rpd = k + 1 < KM ? rpz[I3(k + 1, j, i)] : 0.0;
        double rmd = k + 1 < KM ? rmz[I3(k + 1, j, i)] : 0.0;
        double cneg = rpd < rmz[I3(k, j, i)] ? rpd : rmz[I3(k, j, i)];
        double cpos = rpz[I3(k, j, i)] < rmd ? rpz[I3(k, j, i)] : rmd;
        double a = afb[I3(k, j, i)];
        afb[I3(k, j, i)] =
            k == KM - 1
                ? 0.0
                : 0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
      }

  /* ---- optional 3-D delimiter (O_fct_3d) ---- */
  if (FCT3D) {
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double lo = tlo[I3(k, j, i)];
          double mx = txx[I3(k, j, i)];
          if (txy[I3(k, j, i)] > mx) mx = txy[I3(k, j, i)];
          if (txz[I3(k, j, i)] > mx) mx = txz[I3(k, j, i)];
          double mn2 = tnx[I3(k, j, i)];
          if (tny[I3(k, j, i)] < mn2) mn2 = tny[I3(k, j, i)];
          if (tnz[I3(k, j, i)] < mn2) mn2 = tnz[I3(k, j, i)];
          double aw = afe[I3(k, j, WI(i))], ae = afe[I3(k, j, i)];
          double as = afn[I3(k, SJ(j), i)], an = afn[I3(k, j, i)];
          double ab = afb[I3(k, j, i)];
          double au = k > 0 ? afb[I3(k - 1, j, i)] : 0.0;
          double dp =
              EPSLN +
              dtx[k] * (cstdxt2r[I2(j, i)] *
                            ((aw > 0 ? aw : 0) - (ae < 0 ? ae : 0)) +
                        cstdyt2r[j] *
                            ((as > 0 ? as : 0) - (an < 0 ? an : 0)) +
                        dzt2r[k] * ((ab > 0 ? ab : 0) - (au < 0 ? au : 0)));
          double dm =
              EPSLN +
              dtx[k] * (cstdxt2r[I2(j, i)] *
                            ((ae > 0 ? ae : 0) - (aw < 0 ? aw : 0)) +
                        cstdyt2r[j] *
                            ((an > 0 ? an : 0) - (as < 0 ? as : 0)) +
                        dzt2r[k] * ((au > 0 ? au : 0) - (ab < 0 ? ab : 0)));
          double m0 = tmask[I3(k, j, i)];
          double r1 = m0 * (mx - lo) / dp, r2 = m0 * (lo - mn2) / dm;
          rpx[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;  /* reuse as r3p */
          rmx[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;  /* reuse as r3m */
        }
    setbcx3(rpx, KM);
    setbcx3(rmx, KM);
    /* limit all three directions with the combined ratios; afe/afn
       must be limited from a consistent snapshot, so first compute
       the new values into fe-unused scratch? — the limiter reads only
       (k,j,i)-local and neighbor RATIOS, not neighbor fluxes, so
       in-place is safe */
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double r3pc = rpx[I3(k, j, i)], r3mc = rmx[I3(k, j, i)];
          double r3pe = rpx[I3(k, j, EI(i))], r3me = rmx[I3(k, j, EI(i))];
          double cpos = r3pe < r3mc ? r3pe : r3mc;
          double cneg = r3pc < r3me ? r3pc : r3me;
          double a = afe[I3(k, j, i)];
          afe[I3(k, j, i)] =
              0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
          double r3pn = rpx[I3(k, NJ(j), i)], r3mn = rmx[I3(k, NJ(j), i)];
          cpos = r3pn < r3mc ? r3pn : r3mc;
          cneg = r3pc < r3mn ? r3pc : r3mn;
          a = afn[I3(k, j, i)];
          afn[I3(k, j, i)] =
              0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
          double r3pd = k + 1 < KM ? rpx[I3(k + 1, j, i)] : 0.0;
          double r3md = k + 1 < KM ? rmx[I3(k + 1, j, i)] : 0.0;
          cpos = r3pc < r3md ? r3pc : r3md;
          cneg = r3pd < r3mc ? r3pd : r3mc;
          a = afb[I3(k, j, i)];
          afb[I3(k, j, i)] =
              k == KM - 1
                  ? 0.0
                  : 0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
        }
  }

  /* corrected totals */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double m0 = tmask[I3(k, j, i)];
        fe[I3(k, j, i)] += afe[I3(k, j, i)];
        fn[I3(k, j, i)] = (fn[I3(k, j, i)] + afn[I3(k, j, i)]) * m0;
        fb[I3(k, j, i)] = (fb[I3(k, j, i)] + afb[I3(k, j, i)]) * m0;
      }
#undef EI
#undef WI
#undef NJ
#undef SJ
}

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s in.bin out.bin\n", argv[0]); return 1; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  int hdr[8];
  if (fread(hdr, sizeof(int), 8, f) != 8) return 1;
  NT = hdr[0]; KM = hdr[1]; JMT = hdr[2]; IMT = hdr[3];
  NSTEPS = hdr[4]; NCON = hdr[5]; SCHEME = hdr[6]; FCT3D = hdr[7];
  double sc[2];
  if (fread(sc, sizeof(double), 2, f) != 2) return 1;
  C2DTTS = sc[0]; AH = sc[1];

  double *dxu = rd(f, IMT), *dyu = rd(f, JMT), *csu = rd(f, JMT);
  double *dxt2r = rd(f, IMT), *dyt2r = rd(f, JMT), *dxtr = rd(f, IMT);
  double *dytr = rd(f, JMT), *cstr = rd(f, JMT), *dzt = rd(f, KM);
  double *cstdxt2r = rd(f, (size_t)JMT * IMT), *cstdyt2r = rd(f, JMT);
  double *dzt2r = rd(f, KM);
  double *cstdxur = rd(f, (size_t)JMT * IMT);
  double *cstdxtr = rd(f, (size_t)JMT * IMT);
  double *ahc_n = rd(f, JMT), *ahc_s = rd(f, JMT);
  double *dztr = rd(f, KM), *dztur = rd(f, KM), *dztlr = rd(f, KM);
  double *dtxcel = rd(f, KM), *dztxcl = rd(f, KM);
  double *eos_c = rd(f, (size_t)KM * 9), *eos_to = rd(f, KM),
         *eos_so = rd(f, KM);
  double *kmtd = rd(f, (size_t)JMT * IMT);
  double *tmask = rd(f, (size_t)KM * JMT * IMT);
  double *dcb = rd(f, (size_t)KM * JMT * IMT);
  double *u = rd(f, (size_t)KM * JMT * IMT);
  double *v = rd(f, (size_t)KM * JMT * IMT);
  double *stf = rd(f, (size_t)NT * JMT * IMT);
  double *btf = rd(f, (size_t)NT * JMT * IMT);
  size_t n4 = (size_t)NT * KM * JMT * IMT;
  double *tm1 = rd(f, n4), *tau = rd(f, n4);
  fclose(f);

  int *kmt = malloc((size_t)JMT * IMT * sizeof(int));
  for (size_t q = 0; q < (size_t)JMT * IMT; q++) kmt[q] = (int)kmtd[q];

  size_t n3 = (size_t)KM * JMT * IMT;
  double *vet = calloc(n3, 8), *vnt = calloc(n3, 8), *vbt = calloc(n3, 8);
  double *tnew = malloc(n4 * 8);
  double *fe = malloc(n3 * 8), *fn = malloc(n3 * 8), *fb = malloc(n3 * 8);

  /* ---- adv_vel (kernels.py adv_vel; adv_vel.F:1-253): velocities are
     fixed, compute the face velocities once ---- */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        int jm = (j - 1 + JMT) % JMT;     /* S(): roll semantics */
        int im = (i - 1 + IMT) % IMT;     /* W(): roll semantics */
        vnt[I3(k, j, i)] = (v[I3(k, j, i)] * dxu[i] +
                            v[I3(k, j, im)] * dxu[im]) *
                           csu[j] * dxt2r[i];
        vet[I3(k, j, i)] = (u[I3(k, j, i)] * dyu[j] +
                            u[I3(k, jm, i)] * dyu[jm]) *
                           dyt2r[j];
      }
  setbcx3(vnt, KM);
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++) {
      int jm = (j - 1 + JMT) % JMT, im = (i - 1 + IMT) % IMT;
      double acc = 0.0;
      for (int k = 0; k < KM; k++) {
        double div = ((vet[I3(k, j, i)] - vet[I3(k, j, im)]) * dxtr[i] +
                      (vnt[I3(k, j, i)] - vnt[I3(k, jm, i)]) * dytr[j]) *
                     cstr[j] * dzt[k];
        acc += div;
        vbt[I3(k, j, i)] = acc;
      }
    }
  setbcx3(vbt, KM);

  /* invtri scratch */
  double *ia = malloc(KM * 8), *ib = malloc(KM * 8), *ic = malloc(KM * 8),
         *iff = malloc(KM * 8), *ie = malloc(KM * 8), *iz = malloc(KM * 8);

  /* FCT scratch + per-level leapfrog interval */
  double *tlo = malloc(n3 * 8), *afe = malloc(n3 * 8),
         *afn = malloc(n3 * 8), *afb = malloc(n3 * 8);
  double *frp = malloc(3 * n3 * 8), *frm = malloc(3 * n3 * 8),
         *ftmx = malloc(3 * n3 * 8), *ftmn = malloc(3 * n3 * 8);
  double *dtx = malloc(KM * 8);
  for (int k = 0; k < KM; k++) dtx[k] = C2DTTS * dtxcel[k];

  for (int step = 0; step < NSTEPS; step++) {
    for (int n = 0; n < NT; n++) {
      double *tb = tm1 + (size_t)n * n3;   /* tau-1 */
      double *tc = tau + (size_t)n * n3;   /* tau   */
      double *to = tnew + (size_t)n * n3;

      if (SCHEME > 0) {
        /* FCT dlm1/dlm2 corrected fluxes */
        fct_fluxes(tc, tb, vet, vnt, vbt, tmask, dtx, cstdxt2r,
                   cstdyt2r, dzt2r, fe, fn, fb, tlo, afe, afn, afb,
                   frp, frm, ftmx, ftmn, SCHEME == 2);
      } else {
        /* centered 2x fluxes at tau (tracer_adv_flx.F:1007-1070) */
        for (int k = 0; k < KM; k++)
          for (int j = 0; j < JMT; j++)
            for (int i = 0; i < IMT; i++) {
              int jp = (j + 1) % JMT, ip = (i + 1) % IMT;
              fe[I3(k, j, i)] = vet[I3(k, j, i)] *
                                (tc[I3(k, j, i)] + tc[I3(k, j, ip)]);
              fn[I3(k, j, i)] = vnt[I3(k, j, i)] *
                                (tc[I3(k, j, i)] + tc[I3(k, jp, i)]);
              double tdn = k + 1 < KM ? tc[I3(k + 1, j, i)] : 0.0;
              fb[I3(k, j, i)] = k == KM - 1
                                    ? 0.0
                                    : vbt[I3(k, j, i)] *
                                          (tc[I3(k, j, i)] + tdn);
            }
      }

      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            int jm = (j - 1 + JMT) % JMT, im = (i - 1 + IMT) % IMT;
            int jp = (j + 1) % JMT, ip = (i + 1) % IMT;
            double adv_tx = (fe[I3(k, j, i)] - fe[I3(k, j, im)]) *
                            cstdxt2r[I2(j, i)];
            double adv_ty = (fn[I3(k, j, i)] - fn[I3(k, jm, i)]) *
                            cstdyt2r[j];
            double fb_up = k > 0 ? fb[I3(k - 1, j, i)] : 0.0;
            double adv_tz = (fb_up - fb[I3(k, j, i)]) * dzt2r[k];

            /* const-hmix diffusion (tracer.F:691-798 consthmix) */
            double dfe_c = AH * cstdxur[I2(j, i)] *
                           (tb[I3(k, j, ip)] - tb[I3(k, j, i)]);
            double dfe_w = AH * cstdxur[I2(j, im)] *
                           (tb[I3(k, j, i)] - tb[I3(k, j, im)]);
            double diff_tx = (dfe_c * tmask[I3(k, j, ip)] -
                              dfe_w * tmask[I3(k, j, im)]) *
                             cstdxtr[I2(j, i)];
            double diff_ty =
                ahc_n[j] * tmask[I3(k, jp, i)] *
                    (tb[I3(k, jp, i)] - tb[I3(k, j, i)]) -
                ahc_s[j] * tmask[I3(k, jm, i)] *
                    (tb[I3(k, j, i)] - tb[I3(k, jm, i)]);

            /* aidif = 1: vertical diffusion fully implicit below */
            double tend = diff_tx + diff_ty - adv_tx - adv_ty - adv_tz;
            to[I3(k, j, i)] =
                tb[I3(k, j, i)] +
                C2DTTS * dtxcel[k] * tend * tmask[I3(k, j, i)];
          }

      /* implicit vertical diffusion (ops/tridiag.py invtri spec) */
      const double eps = 1.0e-30;
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          int kb = kmt[I2(j, i)] - 1;
          if (kb < 1) kb = 1;              /* invtri.F:79 max(2,kmz) */
          for (int k = 0; k < KM; k++) {
            double tdt = C2DTTS * dtxcel[k];
            double mk = tmask[I3(k, j, i)];
            double mdn = k + 1 < KM ? tmask[I3(k + 1, j, i)] : mk;
            double dcb_up = k > 0 ? dcb[I3(k - 1, j, i)] : 0.0;
            ia[k] = k == 0 ? 0.0 : -dcb_up * dztur[k] * tdt * mk;
            ic[k] = k == KM - 1 ? 0.0
                                : -dcb[I3(k, j, i)] * dztlr[k] * tdt * mdn;
            ib[k] = 1.0 - ia[k] - ic[k];
            iff[k] = to[I3(k, j, i)] * mk;
            if (k == 0)
              iff[k] += stf[(size_t)n * JMT * IMT + I2(j, i)] * tdt *
                        dztr[0] * mk;
            if (k == kb)
              iff[k] -= btf[(size_t)n * JMT * IMT + I2(j, i)] * tdt *
                        dztr[k] * mk;
          }
          /* forward sweep (solve_tridiag_masked) */
          double bet = tmask[I3(0, j, i)] / (ib[0] + eps);
          iz[0] = iff[0] * bet;
          ie[0] = 0.0;
          for (int k = 1; k < KM; k++) {
            double e = ic[k - 1] * bet;
            bet = tmask[I3(k, j, i)] / (ib[k] - ia[k] * e + eps);
            iz[k] = (iff[k] - ia[k] * iz[k - 1]) * bet;
            ie[k] = e;
          }
          for (int k = KM - 2; k >= 0; k--)
            iz[k] = iz[k] - ie[k + 1] * iz[k + 1];
          for (int k = 0; k < KM; k++) to[I3(k, j, i)] = iz[k];
        }
    }

    /* convct_ncon (convect.F:52-89; ops/convection.py):
       NCON passes x parities, pair densities with the LOWER level's
       EOS coefficients, thickness-weighted mixing */
    double *T = tnew, *S = tnew + n3;
    for (int pass = 0; pass < NCON; pass++)
      for (int par = 0; par < 2; par++)
        for (int k = 0; k + 1 < KM; k++) {
          if (k % 2 != par) continue;
          const double *c = eos_c + (size_t)(k + 1) * 9;
          double tod = eos_to[k + 1], sod = eos_so[k + 1];
          for (int j = 0; j < JMT; j++)
            for (int i = 0; i < IMT; i++) {
              if (kmt[I2(j, i)] <= k + 1) continue;
              double t1 = T[I3(k, j, i)] - tod, s1 = S[I3(k, j, i)] - sod;
              double t2 = T[I3(k + 1, j, i)] - tod,
                     s2 = S[I3(k + 1, j, i)] - sod;
              /* exact Horner form of ops/eos.py dens (dens.h:14-16) */
              double r1 =
                  (c[0] + (c[3] + c[6] * s1) * s1 +
                   (c[2] + c[7] * s1 + c[5] * t1) * t1) * t1 +
                  (c[1] + (c[4] + c[8] * s1) * s1) * s1;
              double r2 =
                  (c[0] + (c[3] + c[6] * s2) * s2 +
                   (c[2] + c[7] * s2 + c[5] * t2) * t2) * t2 +
                  (c[1] + (c[4] + c[8] * s2) * s2) * s2;
              if (r1 > r2) {
                double w1 = dztxcl[k], w2 = dztxcl[k + 1], ws = w1 + w2;
                for (int nn = 0; nn < NT; nn++) {
                  double *tp = tnew + (size_t)nn * n3;
                  double m = (tp[I3(k, j, i)] * w1 +
                              tp[I3(k + 1, j, i)] * w2) / ws;
                  tp[I3(k, j, i)] = m;
                  tp[I3(k + 1, j, i)] = m;
                }
              }
            }
        }

    setbcx3(tnew, NT * KM);

    /* leapfrog rotation: tm1 <- tau, tau <- tnew */
    double *tmp = tm1;
    tm1 = tau;
    tau = tnew;
    tnew = tmp;
  }

  FILE *g = fopen(argv[2], "wb");
  fwrite(tau, sizeof(double), n4, g);
  fclose(g);
  return 0;
}
