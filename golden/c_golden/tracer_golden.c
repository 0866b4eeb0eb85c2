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
 *   [nt, km, jmt, imt, nsteps, ncon]
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

static int NT, KM, JMT, IMT, NSTEPS, NCON;
static double C2DTTS, AH;

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

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage: %s in.bin out.bin\n", argv[0]); return 1; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  int hdr[6];
  if (fread(hdr, sizeof(int), 6, f) != 6) return 1;
  NT = hdr[0]; KM = hdr[1]; JMT = hdr[2]; IMT = hdr[3];
  NSTEPS = hdr[4]; NCON = hdr[5];
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

  for (int step = 0; step < NSTEPS; step++) {
    for (int n = 0; n < NT; n++) {
      double *tb = tm1 + (size_t)n * n3;   /* tau-1 */
      double *tc = tau + (size_t)n * n3;   /* tau   */
      double *to = tnew + (size_t)n * n3;

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
