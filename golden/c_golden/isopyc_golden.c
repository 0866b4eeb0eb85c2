/* Cross-language golden twin of the ISOPYCNAL/GM tracer step.
 *
 * Independent C implementation of the flagship mixing configuration:
 * the Redi small-angle isopycnal tensor with slope-clip taper, the
 * Gent-McWilliams eddy-induced advection velocities, the isoflux
 * east/north/bottom flux additions, FCT (dlm1) advection on the
 * GM-augmented velocities, the aidif-split explicit/implicit vertical
 * diffusion (K33 folded into the implicit coefficient), and ncon
 * convection — the shared spec being source/mom/isopyc.F:348-1300
 * (elements/ai_east/ai_north/ai_bottom/isoflux/isopyc_adv),
 * tracer.F:678-916, invtri.F:1-115 with aidif, and the JAX modules
 * models/ocean/isopyc.py + kernels.py tracer_step.
 *
 * Velocities are FIXED (a prescribed masked flow); tracers step
 * leapfrog for NSTEPS; both implementations consume one binary blob.
 *
 * Usage: ./isopyc_golden input.bin output.bin
 * Blob layout (little-endian): int32 [nt, km, jmt, imt, nsteps, ncon]
 * f64 scalars [c2dtts, ah, slmx, ahisop, athkdf, aidif]
 * f64 arrays:
 *   dxu(imt) dyu(jmt) csu(jmt) cst(jmt) dxt(imt) dyt(jmt)
 *   dxt2r(imt) dyt2r(jmt) dxtr(imt) dytr(jmt) cstr(jmt)
 *   dxur(imt) dyur(jmt) dzt(km) dztr(km) dzt2r(km)
 *   dzw(km+1) dzwrB(km)            [g.dzw, g.dzwr[1:]]
 *   dztur(km) dztlr(km) dtxcel(km)
 *   cstdxt2r(jmt,imt) cstdyt2r(jmt) cstdxur(jmt,imt) cstdxtr(jmt,imt)
 *   dztxcl(km) addisop(jmt)
 *   eos_c(km,9) eos_to(km) eos_so(km)
 *   kmt(jmt,imt f64) tmask(km,jmt,imt) diff_cbt(km,jmt,imt)
 *   u(km,jmt,imt) v(km,jmt,imt) stf(nt,jmt,imt) btf(nt,jmt,imt)
 *   t(nt,km,jmt,imt)               [t_tm1 = t_tau]
 * Output: t(nt,km,jmt,imt) after nsteps.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int NT, KM, JMT, IMT, NSTEPS, NCON;
static double C2DTTS, AH, SLMX, AHISOP, ATHKDF, AIDIF;
#define EPSLN 1.0e-20

#define I3(k, j, i) (((size_t)(k) * JMT + (j)) * IMT + (i))
#define I2(j, i) ((size_t)(j) * IMT + (i))
#define EI(i) (((i) + 1) % IMT)
#define WI(i) (((i) - 1 + IMT) % IMT)
#define NJ(j) (((j) + 1) % JMT)
#define SJ(j) (((j) - 1 + JMT) % JMT)

static double *rd(FILE *f, size_t n) {
  double *p = malloc(n * sizeof(double));
  if (fread(p, sizeof(double), n, f) != n) { exit(1); }
  return p;
}

static void setbcx3(double *a, int lead) {
  for (int m = 0; m < lead; m++)
    for (int j = 0; j < JMT; j++) {
      double *row = a + ((size_t)m * JMT + j) * IMT;
      row[0] = row[IMT - 2];
      row[IMT - 1] = row[1];
    }
}

/* eos derivative Horner forms (dens.h:18-22; ops/eos.py drodt/drods) */
static double drodt(const double *c, double tq, double sq) {
  return c[0] + (c[3] + c[6] * sq) * sq
         + (2.0 * c[2] + 2.0 * c[7] * sq + 3.0 * c[5] * tq) * tq;
}
static double drods(const double *c, double tq, double sq) {
  return (c[3] + 2.0 * c[6] * sq + c[7] * tq) * tq
         + c[1] + (2.0 * c[4] + 3.0 * c[8] * sq) * sq;
}

int main(int argc, char **argv) {
  if (argc < 3) return 1;
  FILE *f = fopen(argv[1], "rb");
  if (!f) return 1;
  int hdr[6];
  if (fread(hdr, sizeof(int), 6, f) != 6) return 1;
  NT = hdr[0]; KM = hdr[1]; JMT = hdr[2]; IMT = hdr[3];
  NSTEPS = hdr[4]; NCON = hdr[5];
  double sc6[6];
  if (fread(sc6, sizeof(double), 6, f) != 6) return 1;
  C2DTTS = sc6[0]; AH = sc6[1]; SLMX = sc6[2]; AHISOP = sc6[3];
  ATHKDF = sc6[4]; AIDIF = sc6[5];

  double *dxu = rd(f, IMT), *dyu = rd(f, JMT), *csu = rd(f, JMT),
         *cst = rd(f, JMT), *dxt = rd(f, IMT), *dyt = rd(f, JMT);
  double *dxt2r = rd(f, IMT), *dyt2r = rd(f, JMT), *dxtr = rd(f, IMT),
         *dytr = rd(f, JMT), *cstr = rd(f, JMT);
  double *dxur = rd(f, IMT), *dyur = rd(f, JMT);
  double *dzt = rd(f, KM), *dztr = rd(f, KM), *dzt2r = rd(f, KM);
  double *dzw = rd(f, KM + 1), *dzwrB = rd(f, KM);
  double *dztur = rd(f, KM), *dztlr = rd(f, KM), *dtxcel = rd(f, KM);
  double *cstdxt2r = rd(f, (size_t)JMT * IMT);
  double *cstdyt2r = rd(f, JMT);
  double *cstdxur = rd(f, (size_t)JMT * IMT);
  double *cstdxtr = rd(f, (size_t)JMT * IMT);
  double *dztxcl = rd(f, KM), *addisop = rd(f, JMT);
  double *eos_c = rd(f, (size_t)KM * 9), *eos_to = rd(f, KM),
         *eos_so = rd(f, KM);
  double *kmtd = rd(f, (size_t)JMT * IMT);
  double *tmask = rd(f, (size_t)KM * JMT * IMT);
  double *dcb0 = rd(f, (size_t)KM * JMT * IMT);
  double *u = rd(f, (size_t)KM * JMT * IMT);
  double *v = rd(f, (size_t)KM * JMT * IMT);
  double *stf = rd(f, (size_t)NT * JMT * IMT);
  double *btf = rd(f, (size_t)NT * JMT * IMT);
  size_t n3 = (size_t)KM * JMT * IMT;
  size_t n4 = (size_t)NT * n3;
  double *tau = rd(f, n4);
  fclose(f);
  double *tm1 = malloc(n4 * 8);
  memcpy(tm1, tau, n4 * 8);
  double *tnew = malloc(n4 * 8);

  int *kmt = malloc((size_t)JMT * IMT * sizeof(int));
  for (size_t q = 0; q < (size_t)JMT * IMT; q++) kmt[q] = (int)kmtd[q];

  /* ---- face advection velocities from the fixed flow ---- */
  double *vet = calloc(n3, 8), *vnt = calloc(n3, 8), *vbt = calloc(n3, 8);
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        int jm = SJ(j), im = WI(i);
        vnt[I3(k, j, i)] = (v[I3(k, j, i)] * dxu[i] +
                            v[I3(k, j, im)] * dxu[im]) * csu[j] * dxt2r[i];
        vet[I3(k, j, i)] = (u[I3(k, j, i)] * dyu[j] +
                            u[I3(k, jm, i)] * dyu[jm]) * dyt2r[j];
      }
  setbcx3(vnt, KM);
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++) {
      int jm = SJ(j), im = WI(i);
      double acc = 0.0;
      for (int k = 0; k < KM; k++) {
        acc += ((vet[I3(k, j, i)] - vet[I3(k, j, im)]) * dxtr[i] +
                (vnt[I3(k, j, i)] - vnt[I3(k, jm, i)]) * dytr[j]) *
               cstr[j] * dzt[k];
        vbt[I3(k, j, i)] = acc;
      }
    }
  setbcx3(vbt, KM);

  /* ---- isopycnal fields (isopyc.py compute_isopyc, small-angle) ---- */
  double *alphai = malloc(n3 * 8), *betai = malloc(n3 * 8);
  double *ddxt[2], *ddyt[2], *ddzt[2];
  for (int n = 0; n < 2; n++) {
    ddxt[n] = malloc(n3 * 8);
    ddyt[n] = malloc(n3 * 8);
    ddzt[n] = malloc(n3 * 8);
  }
  double *K11 = calloc(n3, 8), *K22 = calloc(n3, 8), *K33 = calloc(n3, 8);
  double *aiez = malloc(4 * n3 * 8);   /* [ip*2+kr] */
  double *ainz = malloc(4 * n3 * 8);   /* [jq*2+kr] */
  double *aibx = malloc(4 * n3 * 8);   /* [ip*2+kr] */
  double *aiby = malloc(4 * n3 * 8);   /* [jq*2+kr] */
  double *veti = calloc(n3, 8), *vnti = calloc(n3, 8),
         *vbti = calloc(n3, 8);
  double *vetT = malloc(n3 * 8), *vntT = malloc(n3 * 8),
         *vbtT = malloc(n3 * 8);
  double *dcb = malloc(n3 * 8);       /* diff_cbt + K33 */
  double *sck = malloc(KM * 8);
  for (int k = 0; k < KM; k++) sck[k] = SLMX / sqrt(dtxcel[k]);

#define TAPER(s, k) ((s) > sck[k] ? (sck[k] / ((s) + EPSLN)) \
                                        * (sck[k] / ((s) + EPSLN)) \
                                  : 1.0)
  /* zero-padded k shifts */
#define DNF(a, k, j, i, fill) ((k) + 1 < KM ? (a)[I3((k) + 1, j, i)] : (fill))
#define UPF(a, k, j, i) ((k) > 0 ? (a)[I3((k) - 1, j, i)] : 0.0)

  /* recomputed each step from the tau-1 tracers (the model calls
     compute_isopyc(tm1) inside every step) */
  void compute_iso(const double *T, const double *S) {
  {
    for (int k = 0; k < KM; k++) {
      const double *c = eos_c + (size_t)k * 9;
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double tq = T[I3(k, j, i)] - eos_to[k];
          double sq = S[I3(k, j, i)] - eos_so[k];
          alphai[I3(k, j, i)] = drodt(c, tq, sq);
          betai[I3(k, j, i)] = drods(c, tq, sq);
        }
    }
    setbcx3(alphai, KM);
    setbcx3(betai, KM);
    for (int n = 0; n < 2; n++) {
      const double *F = n == 0 ? T : S;
      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            double mdn = DNF(tmask, k, j, i, 0.0);
            double fdn = DNF(F, k, j, i, 0.0);
            double dz = k == KM - 1
                            ? 0.0
                            : mdn * dzwrB[k] * (F[I3(k, j, i)] - fdn);
            ddzt[n][I3(k, j, i)] = dz;
            ddxt[n][I3(k, j, i)] =
                tmask[I3(k, j, i)] * tmask[I3(k, j, EI(i))] * cstr[j] *
                dxur[i] * (F[I3(k, j, EI(i))] - F[I3(k, j, i)]);
            ddyt[n][I3(k, j, i)] =
                tmask[I3(k, j, i)] * tmask[I3(NJ(j) * 0 + k, NJ(j), i)] *
                dyur[j] * (F[I3(k, NJ(j), i)] - F[I3(k, j, i)]);
          }
      setbcx3(ddxt[n], KM);
      setbcx3(ddyt[n], KM);
      setbcx3(ddzt[n], KM);
    }
  }

  /* ddz at face k-1+kr with optional horizontal shift:
     sh = 0 none, 1 east, 2 north */
#define DDZF(n, kr, sh, k, j, i)                                        \
  ((kr) == 1 ? ((sh) == 1 ? ddzt[n][I3(k, j, EI(i))]                    \
               : (sh) == 2 ? ddzt[n][I3(k, NJ(j), i)]                   \
                           : ddzt[n][I3(k, j, i)])                      \
             : ((k) > 0 ? ((sh) == 1 ? ddzt[n][I3((k) - 1, j, EI(i))]   \
                          : (sh) == 2 ? ddzt[n][I3((k) - 1, NJ(j), i)]  \
                                      : ddzt[n][I3((k) - 1, j, i)])     \
                        : 0.0))

  /* east face: ai_ez + K11 */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double maske = tmask[I3(k, j, i)] * tmask[I3(k, j, EI(i))];
        double ai0e = AHISOP + addisop[j];
        double sum = 0.0;
        for (int ip = 0; ip < 2; ip++) {
          double a_i = ip ? alphai[I3(k, j, EI(i))] : alphai[I3(k, j, i)];
          double b_i = ip ? betai[I3(k, j, EI(i))] : betai[I3(k, j, i)];
          double dxe = a_i * ddxt[0][I3(k, j, i)] +
                       b_i * ddxt[1][I3(k, j, i)];
          for (int kr = 0; kr < 2; kr++) {
            double dze = a_i * DDZF(0, kr, ip ? 1 : 0, k, j, i) +
                         b_i * DDZF(1, kr, ip ? 1 : 0, k, j, i);
            double sxe = fabs(dxe / (dze + EPSLN));
            double ai = ai0e * maske * TAPER(sxe, k);
            aiez[(size_t)(ip * 2 + kr) * n3 + I3(k, j, i)] = ai;
            sum += dzw[k + kr] * ai;
          }
        }
        K11[I3(k, j, i)] = 0.25 * dztr[k] * sum;
      }
  setbcx3(K11, KM);

  /* north face: ai_nz + K22 */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double maskn = tmask[I3(k, j, i)] * tmask[I3(k, NJ(j), i)];
        double sum = 0.0;
        for (int jq = 0; jq < 2; jq++) {
          double a_j = jq ? alphai[I3(k, NJ(j), i)] : alphai[I3(k, j, i)];
          double b_j = jq ? betai[I3(k, NJ(j), i)] : betai[I3(k, j, i)];
          double dyn = a_j * ddyt[0][I3(k, j, i)] +
                       b_j * ddyt[1][I3(k, j, i)];
          for (int kr = 0; kr < 2; kr++) {
            double dzn = a_j * DDZF(0, kr, jq ? 2 : 0, k, j, i) +
                         b_j * DDZF(1, kr, jq ? 2 : 0, k, j, i);
            double syn = fabs(dyn / (dzn + EPSLN));
            double ai = AHISOP * maskn * TAPER(syn, k);
            ainz[(size_t)(jq * 2 + kr) * n3 + I3(k, j, i)] = ai;
            sum += dzw[k + kr] * ai;
          }
        }
        K22[I3(k, j, i)] = 0.25 * dztr[k] * sum;
      }
  setbcx3(K22, KM);

  /* bottom face: ai_bx/ai_by + K33 */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double maskb = DNF(tmask, k, j, i, 0.0);
        double sumx = 0.0, sumy = 0.0;
        for (int kr = 0; kr < 2; kr++) {
          double a_k = kr ? DNF(alphai, k, j, i, 1.0)
                          : alphai[I3(k, j, i)];
          double b_k = kr ? DNF(betai, k, j, i, 1.0) : betai[I3(k, j, i)];
          double dzb = a_k * ddzt[0][I3(k, j, i)] +
                       b_k * ddzt[1][I3(k, j, i)];
          for (int ip = 0; ip < 2; ip++) {
            /* ddxt at (i-1+ip, k+kr) with zero pad below bottom */
            double gxT, gxS;
            int ii = ip ? i : WI(i);
            if (kr == 0) {
              gxT = ddxt[0][I3(k, j, ii)];
              gxS = ddxt[1][I3(k, j, ii)];
            } else {
              gxT = DNF(ddxt[0], k, j, ii, 0.0);
              gxS = DNF(ddxt[1], k, j, ii, 0.0);
            }
            double dxb = a_k * gxT + b_k * gxS;
            double sxb = fabs(dxb / (dzb + EPSLN));
            double ai = AHISOP * maskb * TAPER(sxb, k);
            aibx[(size_t)(ip * 2 + kr) * n3 + I3(k, j, i)] = ai;
            double w = ip ? dxu[i] : dxu[WI(i)];
            sumx += w * ai * sxb * sxb;
          }
          for (int jq = 0; jq < 2; jq++) {
            double gyT, gyS;
            int jj = jq ? j : SJ(j);
            if (kr == 0) {
              gyT = ddyt[0][I3(k, jj, i)];
              gyS = ddyt[1][I3(k, jj, i)];
            } else {
              gyT = DNF(ddyt[0], k, jj, i, 0.0);
              gyS = DNF(ddyt[1], k, jj, i, 0.0);
            }
            double dyb = a_k * gyT + b_k * gyS;
            double syb = fabs(dyb / (dzb + EPSLN));
            double ai = AHISOP * maskb * TAPER(syb, k);
            aiby[(size_t)(jq * 2 + kr) * n3 + I3(k, j, i)] = ai;
            double facty = (jq ? csu[j] : csu[SJ(j)]) *
                           (jq ? dyu[j] : dyu[SJ(j)]);
            sumy += facty * ai * syb * syb;
          }
        }
        double k33 = 0.25 / dxt[i] * sumx +
                     0.25 / dyt[j] * cstr[j] * sumy;
        K33[I3(k, j, i)] = k == KM - 1 ? 0.0 : k33;
      }
  setbcx3(K33, KM);

  /* ---- GM velocities (isopyc_adv; isopyc.py _gm_velocities) ---- */
  /* clamped shifts up1/dn1 */
#define UP1(a, k, j, i) ((k) > 0 ? (a)[I3((k) - 1, j, i)] : (a)[I3(0, j, i)])
#define DN1(a, k, j, i) \
  ((k) + 1 < KM ? (a)[I3((k) + 1, j, i)] : (a)[I3(KM - 1, j, i)])

  for (int dir = 0; dir < 2; dir++) {   /* 0 = north(vnti), 1 = east */
    double **gh = dir == 0 ? ddyt : ddxt;
    double *out = dir == 0 ? vnti : veti;
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          int js = dir == 0 ? NJ(j) : j;
          int is = dir == 0 ? i : EI(i);
          double al = alphai[I3(k, j, i)], an = alphai[I3(k, js, is)];
          double be = betai[I3(k, j, i)], bn = betai[I3(k, js, is)];
          double mp = tmask[I3(k, j, i)] * tmask[I3(k, js, is)];
          double mp_dn = k + 1 < KM
                             ? tmask[I3(k + 1, j, i)] *
                               tmask[I3(k + 1, js, is)]
                             : mp;
          /* top face */
          double at = al + an + UP1(alphai, k, j, i) +
                      UP1(alphai, k, js, is);
          double bt = be + bn + UP1(betai, k, j, i) +
                      UP1(betai, k, js, is);
          double numt =
              at * (gh[0][I3(k, j, i)] + UP1(gh[0], k, j, i)) +
              bt * (gh[1][I3(k, j, i)] + UP1(gh[1], k, j, i));
          double dent =
              at * (UPF(ddzt[0], k, j, i) + UPF(ddzt[0], k, js, is)) +
              bt * (UPF(ddzt[1], k, j, i) + UPF(ddzt[1], k, js, is));
          double s_t = -numt / (dent + EPSLN);
          /* bottom face */
          double ab = al + an + DN1(alphai, k, j, i) +
                      DN1(alphai, k, js, is);
          double bb = be + bn + DN1(betai, k, j, i) +
                      DN1(betai, k, js, is);
          double numb =
              ab * (gh[0][I3(k, j, i)] + DN1(gh[0], k, j, i)) +
              bb * (gh[1][I3(k, j, i)] + DN1(gh[1], k, j, i));
          double denb =
              ab * (ddzt[0][I3(k, j, i)] + ddzt[0][I3(k, js, is)]) +
              bb * (ddzt[1][I3(k, j, i)] + ddzt[1][I3(k, js, is)]);
          double s_b = -numb / (denb + EPSLN);
          double ath_t = ATHKDF * mp * TAPER(fabs(s_t), k);
          double ath_b = ATHKDF * mp_dn * TAPER(fabs(s_b), k);
          double top = k == 0 ? 0.0 : 1.0;
          double bot = k == KM - 1 ? 0.0 : 1.0;
          double val = -(ath_t * s_t * top - ath_b * s_b * bot) * dztr[k];
          out[I3(k, j, i)] = dir == 0 ? val * csu[j] : val;
        }
  }
  setbcx3(veti, KM);
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++) {
      double acc = 0.0;
      for (int k = 0; k < KM; k++) {
        acc += dzt[k] * cstr[j] *
               ((veti[I3(k, j, i)] - veti[I3(k, j, WI(i))]) * dxtr[i] +
                (vnti[I3(k, j, i)] - vnti[I3(k, SJ(j), i)]) * dytr[j]);
        double vb = acc;
        if (k == kmt[I2(j, i)] - 1 || k == KM - 1) vb = 0.0;
        vbti[I3(k, j, i)] = vb;
      }
    }
  setbcx3(vbti, KM);

  /* total advective velocities (GM added) + implicit coefficient */
  for (size_t q = 0; q < n3; q++) {
    vetT[q] = vet[q] + veti[q];
    vntT[q] = vnt[q] + vnti[q];
    vbtT[q] = vbt[q] + vbti[q];
    dcb[q] = dcb0[q] + K33[q];
  }
  }   /* end compute_iso */

  /* per-step scratch */
  double *fe = malloc(n3 * 8), *fn = malloc(n3 * 8), *fb = malloc(n3 * 8);
  double *tlo = malloc(n3 * 8), *afe = malloc(n3 * 8),
         *afn = malloc(n3 * 8), *afb = malloc(n3 * 8);
  double *frp = malloc(3 * n3 * 8), *frm = malloc(3 * n3 * 8),
         *ftmx = malloc(3 * n3 * 8), *ftmn = malloc(3 * n3 * 8);
  double *dfe = malloc(n3 * 8), *dfn = malloc(n3 * 8),
         *fbiso = malloc(n3 * 8), *dfb = malloc(n3 * 8);
  double *dtx = malloc(KM * 8);
  for (int k = 0; k < KM; k++) dtx[k] = C2DTTS * dtxcel[k];
  double *ia = malloc(KM * 8), *ib = malloc(KM * 8), *ic = malloc(KM * 8),
         *iff = malloc(KM * 8), *ie = malloc(KM * 8), *iz = malloc(KM * 8);

  /* FCT limiter — identical algorithm to tracer_golden.c fct_fluxes
     (dlm1), operating on the GM-augmented velocities */
  void fct(const double *tc, const double *tb) {
    double *rpx = frp, *rpy = frp + n3;
    double *rmx = frm, *rmy = frm + n3;
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double t0 = tb[I3(k, j, i)];
          double te = tb[I3(k, j, EI(i))], tn = tb[I3(k, NJ(j), i)];
          double td = k + 1 < KM ? tb[I3(k + 1, j, i)] : 0.0;
          double ve = vetT[I3(k, j, i)], vn = vntT[I3(k, j, i)],
                 vb = vbtT[I3(k, j, i)];
          fe[I3(k, j, i)] = ve * (t0 + te) + fabs(ve) * (t0 - te);
          fn[I3(k, j, i)] = vn * (t0 + tn) + fabs(vn) * (t0 - tn);
          fb[I3(k, j, i)] =
              k == KM - 1 ? 0.0 : vb * (td + t0) + fabs(vb) * (td - t0);
        }
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
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double t0 = tc[I3(k, j, i)];
          double te = tc[I3(k, j, EI(i))], tn = tc[I3(k, NJ(j), i)];
          double td = k + 1 < KM ? tc[I3(k + 1, j, i)] : 0.0;
          afe[I3(k, j, i)] =
              vetT[I3(k, j, i)] * (t0 + te) - fe[I3(k, j, i)];
          afn[I3(k, j, i)] =
              vntT[I3(k, j, i)] * (t0 + tn) - fn[I3(k, j, i)];
          afb[I3(k, j, i)] =
              k == KM - 1 ? 0.0
                          : vbtT[I3(k, j, i)] * (t0 + td) -
                                fb[I3(k, j, i)] * tmask[I3(k, j, i)];
        }
    /* x delimiter */
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double lo = tlo[I3(k, j, i)];
          double mw = tmask[I3(k, j, WI(i))], me = tmask[I3(k, j, EI(i))];
          double hw_w = 0.5 * (tc[I3(k, j, WI(i))] + tc[I3(k, j, i)]);
          double hw_e = 0.5 * (tc[I3(k, j, i)] + tc[I3(k, j, EI(i))]);
          double fxa = mw * hw_w + (1.0 - mw) * lo;
          double fxb = me * hw_e + (1.0 - me) * lo;
          double mx = fxa > fxb ? fxa : fxb;
          double mn = fxa < fxb ? fxa : fxb;
          mx = mx > lo ? mx : lo;
          mn = mn < lo ? mn : lo;
          double aw = afe[I3(k, j, WI(i))], ac = afe[I3(k, j, i)];
          double dcf = dtx[k] * cstdxt2r[I2(j, i)];
          double pp = dcf * ((aw > 0 ? aw : 0) - (ac < 0 ? ac : 0));
          double pm = dcf * ((ac > 0 ? ac : 0) - (aw < 0 ? aw : 0));
          double m0 = tmask[I3(k, j, i)];
          double r1 = m0 * (mx - lo) / (pp + EPSLN);
          double r2 = m0 * (lo - mn) / (pm + EPSLN);
          rpx[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
          rmx[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
        }
    setbcx3(rpx, KM);
    setbcx3(rmx, KM);
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double cpos = rpx[I3(k, j, EI(i))] < rmx[I3(k, j, i)]
                            ? rpx[I3(k, j, EI(i))] : rmx[I3(k, j, i)];
          double cneg = rpx[I3(k, j, i)] < rmx[I3(k, j, EI(i))]
                            ? rpx[I3(k, j, i)] : rmx[I3(k, j, EI(i))];
          double a = afe[I3(k, j, i)];
          afe[I3(k, j, i)] =
              0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
        }
    /* y delimiter */
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double lo = tlo[I3(k, j, i)];
          double ms = tmask[I3(k, SJ(j), i)], mn_ = tmask[I3(k, NJ(j), i)];
          double hw_s = 0.5 * (tc[I3(k, SJ(j), i)] + tc[I3(k, j, i)]);
          double hw_n = 0.5 * (tc[I3(k, j, i)] + tc[I3(k, NJ(j), i)]);
          double fxa = ms * hw_s + (1.0 - ms) * lo;
          double fxb = mn_ * hw_n + (1.0 - mn_) * lo;
          double mx = fxa > fxb ? fxa : fxb;
          double mn2 = fxa < fxb ? fxa : fxb;
          mx = mx > lo ? mx : lo;
          mn2 = mn2 < lo ? mn2 : lo;
          double as = afn[I3(k, SJ(j), i)], ac = afn[I3(k, j, i)];
          double dcf = dtx[k] * cstdyt2r[j];
          double pp = dcf * ((as > 0 ? as : 0) - (ac < 0 ? ac : 0));
          double pm = dcf * ((ac > 0 ? ac : 0) - (as < 0 ? as : 0));
          double m0 = tmask[I3(k, j, i)];
          double r1 = m0 * (mx - lo) / (pp + EPSLN);
          double r2 = m0 * (lo - mn2) / (pm + EPSLN);
          rpy[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
          rmy[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
        }
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double cpos = rpy[I3(k, NJ(j), i)] < rmy[I3(k, j, i)]
                            ? rpy[I3(k, NJ(j), i)] : rmy[I3(k, j, i)];
          double cneg = rpy[I3(k, j, i)] < rmy[I3(k, NJ(j), i)]
                            ? rpy[I3(k, j, i)] : rmy[I3(k, NJ(j), i)];
          double a = afn[I3(k, j, i)];
          afn[I3(k, j, i)] =
              0.5 * ((cpos + cneg) * a + (cpos - cneg) * fabs(a));
        }
    /* z delimiter */
    double *rpz = frp + 2 * n3, *rmz = frm + 2 * n3;
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double lo = tlo[I3(k, j, i)];
          double fxa, fxb;
          if (k == 0) fxa = lo;
          else {
            double mu = tmask[I3(k - 1, j, i)];
            fxa = mu * 0.5 * (tc[I3(k - 1, j, i)] + tc[I3(k, j, i)]) +
                  (1.0 - mu) * lo;
          }
          if (k == KM - 1) fxb = lo;
          else {
            double md = tmask[I3(k + 1, j, i)];
            fxb = md * 0.5 * (tc[I3(k, j, i)] + tc[I3(k + 1, j, i)]) +
                  (1.0 - md) * lo;
          }
          double mx = fxa > fxb ? fxa : fxb;
          double mn2 = fxa < fxb ? fxa : fxb;
          mx = mx > lo ? mx : lo;
          mn2 = mn2 < lo ? mn2 : lo;
          double ac = afb[I3(k, j, i)];
          double au = k > 0 ? afb[I3(k - 1, j, i)] : 0.0;
          double dcf = dtx[k] * dzt2r[k];
          double pp = dcf * ((ac > 0 ? ac : 0) - (au < 0 ? au : 0));
          double pm = dcf * ((au > 0 ? au : 0) - (ac < 0 ? ac : 0));
          double m0 = tmask[I3(k, j, i)];
          double r1 = m0 * (mx - lo) / (pp + EPSLN);
          double r2 = m0 * (lo - mn2) / (pm + EPSLN);
          rpz[I3(k, j, i)] = r1 < 1.0 ? r1 : 1.0;
          rmz[I3(k, j, i)] = r2 < 1.0 ? r2 : 1.0;
        }
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
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
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double m0 = tmask[I3(k, j, i)];
          fe[I3(k, j, i)] += afe[I3(k, j, i)];
          fn[I3(k, j, i)] = (fn[I3(k, j, i)] + afn[I3(k, j, i)]) * m0;
          fb[I3(k, j, i)] = (fb[I3(k, j, i)] + afb[I3(k, j, i)]) * m0;
        }
  }

  /* tdiff across face k-1+kr (isoflux vdiff) */
#define VDIFF(tp, kr, k, j, i)                                          \
  ((kr) == 0 ? ((k) == 0 ? 0.0                                          \
                         : ((k) > 0 ? (tp)[I3((k) - 1, j, i)] : 0.0) -  \
                               (tp)[I3(k, j, i)])                       \
             : ((k) == KM - 1                                           \
                    ? 0.0                                               \
                    : (tp)[I3(k, j, i)] -                               \
                          ((k) + 1 < KM ? (tp)[I3((k) + 1, j, i)] : 0.0)))

  for (int step = 0; step < NSTEPS; step++) {
    compute_iso(tm1, tm1 + n3);
    for (int n = 0; n < NT; n++) {
      double *tb = tm1 + (size_t)n * n3;
      double *tc = tau + (size_t)n * n3;
      double *to = tnew + (size_t)n * n3;

      fct(tc, tb);

      /* isoflux additions for this tracer (small-angle) */
      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            /* east face */
            double sumz = 0.0;
            for (int ip = 0; ip < 2; ip++) {
              double a_i =
                  ip ? alphai[I3(k, j, EI(i))] : alphai[I3(k, j, i)];
              double b_i =
                  ip ? betai[I3(k, j, EI(i))] : betai[I3(k, j, i)];
              double dxe = a_i * ddxt[0][I3(k, j, i)] +
                           b_i * ddxt[1][I3(k, j, i)];
              for (int kr = 0; kr < 2; kr++) {
                double dze = a_i * DDZF(0, kr, ip ? 1 : 0, k, j, i) +
                             b_i * DDZF(1, kr, ip ? 1 : 0, k, j, i);
                double vd;
                if (ip == 0)
                  vd = VDIFF(tb, kr, k, j, i);
                else {
                  int ii = EI(i);
                  vd = (kr == 0)
                           ? (k == 0 ? 0.0
                                     : ((k > 0 ? tb[I3(k - 1, j, ii)]
                                               : 0.0) -
                                        tb[I3(k, j, ii)]))
                           : (k == KM - 1
                                  ? 0.0
                                  : tb[I3(k, j, ii)] -
                                        (k + 1 < KM
                                             ? tb[I3(k + 1, j, ii)]
                                             : 0.0));
                }
                sumz -= aiez[(size_t)(ip * 2 + kr) * n3 + I3(k, j, i)] *
                        vd * dxe / (dze + EPSLN);
              }
            }
            dfe[I3(k, j, i)] =
                0.25 * dztr[k] * sumz +
                K11[I3(k, j, i)] * cstdxur[I2(j, i)] *
                    (tb[I3(k, j, EI(i))] - tb[I3(k, j, i)]) +
                AH * cstdxur[I2(j, i)] *
                    (tb[I3(k, j, EI(i))] - tb[I3(k, j, i)]);
            /* north face */
            sumz = 0.0;
            for (int jq = 0; jq < 2; jq++) {
              double a_j =
                  jq ? alphai[I3(k, NJ(j), i)] : alphai[I3(k, j, i)];
              double b_j =
                  jq ? betai[I3(k, NJ(j), i)] : betai[I3(k, j, i)];
              double dyn = a_j * ddyt[0][I3(k, j, i)] +
                           b_j * ddyt[1][I3(k, j, i)];
              for (int kr = 0; kr < 2; kr++) {
                double dzn = a_j * DDZF(0, kr, jq ? 2 : 0, k, j, i) +
                             b_j * DDZF(1, kr, jq ? 2 : 0, k, j, i);
                double vd;
                if (jq == 0)
                  vd = VDIFF(tb, kr, k, j, i);
                else {
                  int jj = NJ(j);
                  vd = (kr == 0)
                           ? (k == 0 ? 0.0
                                     : ((k > 0 ? tb[I3(k - 1, jj, i)]
                                               : 0.0) -
                                        tb[I3(k, jj, i)]))
                           : (k == KM - 1
                                  ? 0.0
                                  : tb[I3(k, jj, i)] -
                                        (k + 1 < KM
                                             ? tb[I3(k + 1, jj, i)]
                                             : 0.0));
                }
                sumz -= ainz[(size_t)(jq * 2 + kr) * n3 + I3(k, j, i)] *
                        vd * dyn / (dzn + EPSLN);
              }
            }
            dfn[I3(k, j, i)] =
                csu[j] * 0.25 * dztr[k] * sumz +
                K22[I3(k, j, i)] * (csu[j] * dyur[j]) *
                    (tb[I3(k, NJ(j), i)] - tb[I3(k, j, i)]) +
                AH * (csu[j] * dyur[j]) *
                    (tb[I3(k, NJ(j), i)] - tb[I3(k, j, i)]);
            /* bottom face explicit K31/K32 */
            double sumx = 0.0, sumy = 0.0;
            for (int kr = 0; kr < 2; kr++) {
              double a_k = kr ? DNF(alphai, k, j, i, 1.0)
                              : alphai[I3(k, j, i)];
              double b_k =
                  kr ? DNF(betai, k, j, i, 1.0) : betai[I3(k, j, i)];
              double dzb = a_k * ddzt[0][I3(k, j, i)] +
                           b_k * ddzt[1][I3(k, j, i)];
              for (int ip = 0; ip < 2; ip++) {
                int ii = ip ? i : WI(i);
                double gxT = kr == 0 ? ddxt[0][I3(k, j, ii)]
                                     : DNF(ddxt[0], k, j, ii, 0.0);
                double gxS = kr == 0 ? ddxt[1][I3(k, j, ii)]
                                     : DNF(ddxt[1], k, j, ii, 0.0);
                double gx = a_k * gxT + b_k * gxS;
                double tk0 = kr == 0 ? tb[I3(k, j, i)]
                                     : DNF(tb, k, j, i, 0.0);
                double tkw = kr == 0 ? tb[I3(k, j, WI(i))]
                                     : DNF(tb, k, j, WI(i), 0.0);
                double tke = kr == 0 ? tb[I3(k, j, EI(i))]
                                     : DNF(tb, k, j, EI(i), 0.0);
                double tdiff = ip ? (tke - tk0) : (tk0 - tkw);
                sumx -= aibx[(size_t)(ip * 2 + kr) * n3 + I3(k, j, i)] *
                        cstr[j] * tdiff * gx / (dzb + EPSLN);
              }
              for (int jq = 0; jq < 2; jq++) {
                int jj = jq ? j : SJ(j);
                double gyT = kr == 0 ? ddyt[0][I3(k, jj, i)]
                                     : DNF(ddyt[0], k, jj, i, 0.0);
                double gyS = kr == 0 ? ddyt[1][I3(k, jj, i)]
                                     : DNF(ddyt[1], k, jj, i, 0.0);
                double gy = a_k * gyT + b_k * gyS;
                double tk0 = kr == 0 ? tb[I3(k, j, i)]
                                     : DNF(tb, k, j, i, 0.0);
                double tks = kr == 0 ? tb[I3(k, SJ(j), i)]
                                     : DNF(tb, k, SJ(j), i, 0.0);
                double tkn = kr == 0 ? tb[I3(k, NJ(j), i)]
                                     : DNF(tb, k, NJ(j), i, 0.0);
                double tdiff = jq ? (tkn - tk0) : (tk0 - tks);
                double fy = jq ? csu[j] : csu[SJ(j)];
                sumy -= aiby[(size_t)(jq * 2 + kr) * n3 + I3(k, j, i)] *
                        fy * tdiff * gy / (dzb + EPSLN);
              }
            }
            fbiso[I3(k, j, i)] =
                k == KM - 1 ? 0.0
                            : 0.25 / dxt[i] * sumx +
                                  0.25 / dyt[j] * cstr[j] * sumy;
          }

      /* explicit vertical diffusive flux with (diff_cbt + K33) */
      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            double tdn = k + 1 < KM ? tb[I3(k + 1, j, i)] : 0.0;
            double d = k == KM - 1
                           ? 0.0
                           : dcb[I3(k, j, i)] * dzwrB[k] *
                                 (tb[I3(k, j, i)] - tdn);
            if (k == kmt[I2(j, i)] - 1)
              d = btf[(size_t)n * JMT * IMT + I2(j, i)];
            dfb[I3(k, j, i)] = d;
          }

      /* update */
      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            int jm = SJ(j), im = WI(i), jp = NJ(j);
            double adv_tx = (fe[I3(k, j, i)] - fe[I3(k, j, im)]) *
                            cstdxt2r[I2(j, i)];
            double adv_ty = (fn[I3(k, j, i)] - fn[I3(k, jm, i)]) *
                            cstdyt2r[j];
            double fup = k > 0 ? fb[I3(k - 1, j, i)] : 0.0;
            double adv_tz = (fup - fb[I3(k, j, i)]) * dzt2r[k];
            double diff_tx =
                (dfe[I3(k, j, i)] * tmask[I3(k, j, EI(i))] -
                 dfe[I3(k, j, im)] * tmask[I3(k, j, im)]) *
                cstdxtr[I2(j, i)];
            double diff_ty =
                (dfn[I3(k, j, i)] * tmask[I3(k, jp, i)] -
                 dfn[I3(k, jm, i)] * tmask[I3(k, jm, i)]) *
                (1.0 / (cst[j] * dyt[j]));
            double fb_ab = k == 0 ? stf[(size_t)n * JMT * IMT + I2(j, i)]
                                  : dfb[I3(k - 1, j, i)];
            double diff_tz =
                (fb_ab - dfb[I3(k, j, i)]) * dztr[k] * (1.0 - AIDIF);
            double fbi_up = k > 0 ? fbiso[I3(k - 1, j, i)] : 0.0;
            diff_tz += (fbi_up - fbiso[I3(k, j, i)]) * dztr[k];
            double tend = diff_tx + diff_ty + diff_tz - adv_tx -
                          adv_ty - adv_tz;
            to[I3(k, j, i)] =
                tb[I3(k, j, i)] +
                dtx[k] * tend * tmask[I3(k, j, i)];
          }

      /* implicit vertical diffusion with aidif (invtri.F) */
      const double eps = 1.0e-30;
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          int kb = kmt[I2(j, i)] - 1;
          if (kb < 1) kb = 1;
          for (int k = 0; k < KM; k++) {
            double tdt = dtx[k];
            double mk = tmask[I3(k, j, i)];
            double mdn = k + 1 < KM ? tmask[I3(k + 1, j, i)] : mk;
            double dcb_up = k > 0 ? dcb[I3(k - 1, j, i)] : 0.0;
            ia[k] = k == 0 ? 0.0 : -dcb_up * dztur[k] * tdt * AIDIF * mk;
            ic[k] = k == KM - 1
                        ? 0.0
                        : -dcb[I3(k, j, i)] * dztlr[k] * tdt * AIDIF * mdn;
            ib[k] = 1.0 - ia[k] - ic[k];
            iff[k] = to[I3(k, j, i)] * mk;
            if (k == 0)
              iff[k] += stf[(size_t)n * JMT * IMT + I2(j, i)] * tdt *
                        dztr[0] * AIDIF * mk;
            if (k == kb)
              iff[k] -= btf[(size_t)n * JMT * IMT + I2(j, i)] * tdt *
                        dztr[k] * AIDIF * mk;
          }
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

    /* ncon convection (as in tracer_golden.c) */
    double *Tt = tnew, *St = tnew + n3;
    for (int pass = 0; pass < NCON; pass++)
      for (int par = 0; par < 2; par++)
        for (int k = 0; k + 1 < KM; k++) {
          if (k % 2 != par) continue;
          const double *c = eos_c + (size_t)(k + 1) * 9;
          double tod = eos_to[k + 1], sod = eos_so[k + 1];
          for (int j = 0; j < JMT; j++)
            for (int i = 0; i < IMT; i++) {
              if (kmt[I2(j, i)] <= k + 1) continue;
              double t1 = Tt[I3(k, j, i)] - tod,
                     s1 = St[I3(k, j, i)] - sod;
              double t2 = Tt[I3(k + 1, j, i)] - tod,
                     s2 = St[I3(k + 1, j, i)] - sod;
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
