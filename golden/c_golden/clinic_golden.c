/* Cross-language golden twin of the baroclinic momentum step.
 *
 * Independent C implementation of the exact discrete clinic spec the
 * JAX kernel implements (models/ocean/kernels.py clinic_step +
 * hydrostatic_grad_p + the U-cell face velocities of adv_vel) — the
 * shared spec being source/mom/clinic.F:84-472 (pressure-gradient
 * integration, advective + diffusive + Coriolis + metric updates,
 * vertical-mean removal) and adv_vel.F:166-249.  Density is a fixed
 * input field (tracers frozen), surface/bottom momentum fluxes fixed;
 * the internal-mode velocity is stepped leapfrog for NSTEPS.
 *
 * Usage: ./clinic_golden input.bin output.bin
 * Blob layout (little-endian): int32 [km, jmt, imt, nsteps]
 * f64 scalars [c2dtuv, grav_rho0r]
 * then f64 arrays:
 *   dxu(imt) dyu(jmt) csu(jmt) dxt2r(imt) dyt2r(jmt) dxtr(imt)
 *   dytr(jmt) cstr(jmt) dzt(km)
 *   duw(imt) due(imt) dun(jmt) dus(jmt) dxur(imt) dyur(jmt)
 *   csur(jmt) cst(jmt)
 *   dzt2r(km) dztr(km) dzwA(km) dzwr(km)
 *   dxu2r(imt) dyu2r(jmt) dyu4r(jmt)
 *   csudxu2r(jmt,imt) csudxur(jmt,imt) csudyu2r(jmt)
 *   am_csudxtr(jmt,imt)
 *   amc_north(jmt) amc_south(jmt) am3(jmt) am4(2,jmt) advmet(2,jmt)
 *   dxmetr(imt) cori(2,jmt,imt)
 *   hr(jmt,imt) kmu(jmt,imt as f64) umask(km,jmt,imt)
 *   visc_cbu(km,jmt,imt) smf(2,jmt,imt) bmf(2,jmt,imt)
 *   rho(km,jmt,imt) u0(2,km,jmt,imt)
 * Output: u_int(2,km,jmt,imt) after nsteps.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int KM, JMT, IMT, NSTEPS;
static double C2DTUV, GRR;

#define I3(k, j, i) (((size_t)(k) * JMT + (j)) * IMT + (i))
#define I2(j, i) ((size_t)(j) * IMT + (i))
#define EI(i) (((i) + 1) % IMT)
#define WI(i) (((i) - 1 + IMT) % IMT)
#define NJ(j) (((j) + 1) % JMT)
#define SJ(j) (((j) - 1 + JMT) % JMT)

static double *rd(FILE *f, size_t n) {
  double *p = malloc(n * sizeof(double));
  if (fread(p, sizeof(double), n, f) != n) {
    fprintf(stderr, "short read\n");
    exit(1);
  }
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

int main(int argc, char **argv) {
  if (argc < 3) { fprintf(stderr, "usage\n"); return 1; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("open"); return 1; }
  int hdr[4];
  if (fread(hdr, sizeof(int), 4, f) != 4) return 1;
  KM = hdr[0]; JMT = hdr[1]; IMT = hdr[2]; NSTEPS = hdr[3];
  double sc[2];
  if (fread(sc, sizeof(double), 2, f) != 2) return 1;
  C2DTUV = sc[0]; GRR = sc[1];

  double *dxu = rd(f, IMT), *dyu = rd(f, JMT), *csu = rd(f, JMT);
  double *dxt2r = rd(f, IMT), *dyt2r = rd(f, JMT), *dxtr = rd(f, IMT);
  double *dytr = rd(f, JMT), *cstr = rd(f, JMT), *dzt = rd(f, KM);
  double *duw = rd(f, IMT), *due = rd(f, IMT), *dun = rd(f, JMT),
         *dus = rd(f, JMT), *dxur = rd(f, IMT), *dyur = rd(f, JMT),
         *csur = rd(f, JMT), *cst = rd(f, JMT);
  double *dzt2r = rd(f, KM), *dztr = rd(f, KM), *dzwA = rd(f, KM),
         *dzwr = rd(f, KM);
  double *dxu2r = rd(f, IMT), *dyu2r = rd(f, JMT), *dyu4r = rd(f, JMT);
  double *csudxu2r = rd(f, (size_t)JMT * IMT);
  double *csudxur = rd(f, (size_t)JMT * IMT);
  double *csudyu2r = rd(f, JMT);
  double *amcsudxtr = rd(f, (size_t)JMT * IMT);
  double *amc_n = rd(f, JMT), *amc_s = rd(f, JMT), *am3 = rd(f, JMT);
  double *am4 = rd(f, 2 * (size_t)JMT), *advmet = rd(f, 2 * (size_t)JMT);
  double *dxmetr = rd(f, IMT);
  double *cori = rd(f, 2 * (size_t)JMT * IMT);
  double *hr = rd(f, (size_t)JMT * IMT);
  double *kmud = rd(f, (size_t)JMT * IMT);
  double *umask = rd(f, (size_t)KM * JMT * IMT);
  double *vcb = rd(f, (size_t)KM * JMT * IMT);
  double *smf = rd(f, 2 * (size_t)JMT * IMT);
  double *bmf = rd(f, 2 * (size_t)JMT * IMT);
  double *rho = rd(f, (size_t)KM * JMT * IMT);
  size_t n4 = 2 * (size_t)KM * JMT * IMT;
  double *utau = rd(f, n4);
  fclose(f);
  double *utm1 = malloc(n4 * 8);
  memcpy(utm1, utau, n4 * 8);

  int *kmu = malloc((size_t)JMT * IMT * sizeof(int));
  for (size_t q = 0; q < (size_t)JMT * IMT; q++) kmu[q] = (int)kmud[q];

  size_t n3 = (size_t)KM * JMT * IMT;
  double *gp = malloc(2 * n3 * 8);
  double *vet = calloc(n3, 8), *vnt = calloc(n3, 8), *vbt = calloc(n3, 8);
  double *veu = calloc(n3, 8), *vnu = calloc(n3, 8), *vbu = calloc(n3, 8);
  double *unew = malloc(n4 * 8);
  double *afe = malloc(n3 * 8), *afb = malloc(n3 * 8);
  double *dfe = malloc(n3 * 8), *dfb = malloc(n3 * 8);

  /* ---- hydrostatic pressure gradients (clinic.F:84-169), rho fixed */
  for (int k = 0; k < KM; k++)
    for (int j = 0; j < JMT; j++)
      for (int i = 0; i < IMT; i++) {
        double g1, g2;
        if (k == 0) {
          double t1 = rho[I3(0, NJ(j), EI(i))] - rho[I3(0, j, i)];
          double t2 = rho[I3(0, NJ(j), i)] - rho[I3(0, j, EI(i))];
          g1 = (t1 - t2) * (GRR * dzwA[0]) * csur[j] * dxu2r[i];
          g2 = (t1 + t2) * (GRR * dzwA[0]) * dyu2r[j];
        } else {
          double a00 = rho[I3(k - 1, j, i)] + rho[I3(k, j, i)];
          double a11 = rho[I3(k - 1, NJ(j), EI(i))] +
                       rho[I3(k, NJ(j), EI(i))];
          double a10 = rho[I3(k - 1, NJ(j), i)] + rho[I3(k, NJ(j), i)];
          double a01 = rho[I3(k - 1, j, EI(i))] + rho[I3(k, j, EI(i))];
          double t1k = a11 - a00, t2k = a10 - a01;
          g1 = (GRR * 0.5) * csur[j] * (t1k - t2k) * dzwA[k] * dxu2r[i];
          g2 = GRR * dyu4r[j] * (t1k + t2k) * dzwA[k];
        }
        gp[I3(k, j, i)] = g1 + (k > 0 ? gp[I3(k - 1, j, i)] : 0.0);
        gp[n3 + I3(k, j, i)] =
            g2 + (k > 0 ? gp[n3 + I3(k - 1, j, i)] : 0.0);
      }
  setbcx3(gp, 2 * KM);

  for (int step = 0; step < NSTEPS; step++) {
    double *u = utau, *v = utau + n3;

    /* ---- T-cell face velocities (adv_vel.F:1-150) ---- */
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          int jm = SJ(j), im = WI(i);
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
        int jm = SJ(j), im = WI(i);
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

    /* ---- U-cell face velocities (adv_vel.F:166-249) ---- */
    for (int k = 0; k < KM; k++)
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          int jp = NJ(j), ip = EI(i);
          vnu[I3(k, j, i)] =
              ((vnt[I3(k, j, i)] * duw[i] + vnt[I3(k, j, ip)] * due[i]) *
                   dus[jp] +
               (vnt[I3(k, jp, i)] * duw[i] +
                vnt[I3(k, jp, ip)] * due[i]) *
                   dun[j]) *
              dytr[jp] * dxur[i];
          veu[I3(k, j, i)] =
              ((vet[I3(k, j, i)] * dus[j] + vet[I3(k, jp, i)] * dun[j]) *
                   duw[ip] +
               (vet[I3(k, j, ip)] * dus[j] +
                vet[I3(k, jp, ip)] * dun[j]) *
                   due[i]) *
              dyur[j] * dxtr[ip];
          double dyn = dun[j] * cst[jp], dys = dus[j] * cst[j];
          vbu[I3(k, j, i)] =
              dyur[j] * csur[j] * dxur[i] *
              (vbt[I3(k, j, i)] * (duw[i] * dys) +
               vbt[I3(k, j, ip)] * (due[i] * dys) +
               vbt[I3(k, jp, i)] * (duw[i] * dyn) +
               vbt[I3(k, jp, ip)] * (due[i] * dyn));
        }
    setbcx3(vnu, KM);
    setbcx3(veu, KM);
    setbcx3(vbu, KM);

    /* ---- momentum update per component (clinic.F:177-403) ---- */
    for (int n = 0; n < 2; n++) {
      double *un = utau + (size_t)n * n3;
      double *um1 = utm1 + (size_t)n * n3;
      double *on = utau + (size_t)(1 - n) * n3;
      double *om1 = utm1 + (size_t)(1 - n) * n3;
      double *out = unew + (size_t)n * n3;

      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            int ip = EI(i);
            double udn = k + 1 < KM ? un[I3(k + 1, j, i)] : 0.0;
            afe[I3(k, j, i)] =
                veu[I3(k, j, i)] * (un[I3(k, j, i)] + un[I3(k, j, ip)]);
            afb[I3(k, j, i)] = vbu[I3(k, j, i)] * (un[I3(k, j, i)] + udn);
            double um1dn = k + 1 < KM ? um1[I3(k + 1, j, i)] : 0.0;
            double dfbv = k == KM - 1
                              ? 0.0
                              : vcb[I3(k, j, i)] * dzwr[k] *
                                    (um1[I3(k, j, i)] - um1dn);
            if (k == kmu[I2(j, i)] - 1) dfbv = bmf[(size_t)n * JMT * IMT + I2(j, i)];
            dfb[I3(k, j, i)] = dfbv;
            dfe[I3(k, j, i)] = amcsudxtr[I2(j, i)] *
                               (um1[I3(k, j, ip)] - um1[I3(k, j, i)]);
          }

      for (int k = 0; k < KM; k++)
        for (int j = 0; j < JMT; j++)
          for (int i = 0; i < IMT; i++) {
            int jp = NJ(j), jm = SJ(j), ip = EI(i), im = WI(i);
            double adv_ux = (afe[I3(k, j, i)] - afe[I3(k, j, im)]) *
                            csudxu2r[I2(j, i)];
            double adv_uy =
                (vnu[I3(k, j, i)] * (un[I3(k, j, i)] + un[I3(k, jp, i)]) -
                 vnu[I3(k, jm, i)] *
                     (un[I3(k, jm, i)] + un[I3(k, j, i)])) *
                csudyu2r[j];
            double afb_up = k > 0 ? afb[I3(k - 1, j, i)] : 0.0;
            double adv_uz = (afb_up - afb[I3(k, j, i)]) * dzt2r[k];
            double adv_met = advmet[(size_t)n * JMT + j] *
                             utau[I3(k, j, i)] * on[I3(k, j, i)];
            double diff_ux = (dfe[I3(k, j, i)] - dfe[I3(k, j, im)]) *
                             csudxur[I2(j, i)];
            double diff_uy =
                amc_n[j] * (um1[I3(k, jp, i)] - um1[I3(k, j, i)]) -
                amc_s[j] * (um1[I3(k, j, i)] - um1[I3(k, jm, i)]);
            double fb_above = k == 0 ? smf[(size_t)n * JMT * IMT + I2(j, i)]
                                     : dfb[I3(k - 1, j, i)];
            double diff_uz = (fb_above - dfb[I3(k, j, i)]) * dztr[k];
            double diff_met =
                am3[j] * um1[I3(k, j, i)] +
                am4[(size_t)n * JMT + j] * dxmetr[i] *
                    (om1[I3(k, j, ip)] - om1[I3(k, j, im)]);
            double corio = cori[(size_t)n * JMT * IMT + I2(j, i)] *
                           on[I3(k, j, i)];
            double tend = (diff_ux + diff_uy + diff_uz + diff_met -
                           adv_ux - adv_uy - adv_uz + adv_met -
                           gp[(size_t)n * n3 + I3(k, j, i)] + corio) *
                          umask[I3(k, j, i)];
            out[I3(k, j, i)] = um1[I3(k, j, i)] + C2DTUV * tend;
          }
    }

    /* remove vertical mean, mask, setbcx (clinic.F:364-472) */
    for (int n = 0; n < 2; n++) {
      double *out = unew + (size_t)n * n3;
      for (int j = 0; j < JMT; j++)
        for (int i = 0; i < IMT; i++) {
          double bar = 0.0;
          for (int k = 0; k < KM; k++)
            bar += out[I3(k, j, i)] * dzt[k];
          bar *= hr[I2(j, i)];
          for (int k = 0; k < KM; k++) {
            double m = umask[I3(k, j, i)];
            out[I3(k, j, i)] = (out[I3(k, j, i)] - m * bar) * m;
          }
        }
    }
    setbcx3(unew, 2 * KM);

    /* leapfrog rotation */
    double *tmp = utm1;
    utm1 = utau;
    utau = unew;
    unew = tmp;
  }

  FILE *g = fopen(argv[2], "wb");
  fwrite(utau, sizeof(double), n4, g);
  fclose(g);
  return 0;
}
