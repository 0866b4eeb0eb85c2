/* Cross-language golden twin of the island-constrained barotropic CG.
 *
 * Independent C implementation of the exact deflated
 * preconditioned-CG spec of ops/solvers.py congrad (the shared spec
 * being source/mom/congrad.F:62-470, Dukowicz/Smith/Malone 1993:
 * diagonal preconditioner with island-perimeter diagonal sums
 * :862-930, sum_dist/avg_dist perimeter reductions :933-1040, the
 * geometric-series error extrapolation :415-426), plus the
 * constant-mode deflation this framework adds (documented divergence:
 * the reference's post-solve con_adjust normalization is replaced by
 * in-iteration deflation of the exact null vector).
 *
 * Usage: ./congrad_golden input.bin output.bin
 * Blob (little-endian): int32 [jmt, imt, nisle, imain, max_iter]
 * f64 [tol]
 * arrays: cf(3,3,jmt,imt) guess(jmt,imt) forc(jmt,imt)
 *         perim_id(jmt,imt as f64, -1 = none) counts(nisle)
 * Output: dpsi(jmt,imt) then [iterations, converged] as f64.
 */
#include <math.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int JMT, IMT, NISLE, IMAIN, MAXIT;
static double TOL;

#define I2(j, i) ((size_t)(j) * IMT + (i))

static double *rd(FILE *f, size_t n) {
  double *p = malloc(n * sizeof(double));
  if (fread(p, sizeof(double), n, f) != n) { exit(1); }
  return p;
}

static int *PID;
static double *CNT;

static void border(double *v) {
  for (int i = 0; i < IMT; i++) {
    v[I2(0, i)] = 0.0;
    v[I2(JMT - 1, i)] = 0.0;
  }
  for (int j = 0; j < JMT; j++) {
    v[I2(j, 0)] = v[I2(j, IMT - 2)];
    v[I2(j, IMT - 1)] = v[I2(j, 1)];
  }
}

static void island_sum(const double *x, double *sums) {
  for (int m = 0; m < NISLE; m++) sums[m] = 0.0;
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++)
      if (PID[I2(j, i)] >= 0) sums[PID[I2(j, i)]] += x[I2(j, i)];
}

static void sum_dist(double *x, double *sums) {
  if (NISLE == 0) return;
  island_sum(x, sums);
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++)
      if (PID[I2(j, i)] >= 0) x[I2(j, i)] = sums[PID[I2(j, i)]];
}

static void avg_dist(double *x, double *sums) {
  if (NISLE == 0) return;
  island_sum(x, sums);
  for (int m = 0; m < NISLE; m++) sums[m] /= CNT[m];
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++)
      if (PID[I2(j, i)] >= 0) x[I2(j, i)] = sums[PID[I2(j, i)]];
}

static void apply_op9(const double *cf, const double *x, double *res) {
  for (int j = 0; j < JMT; j++)
    for (int i = 0; i < IMT; i++) {
      double acc = 0.0;
      for (int dj = -1; dj <= 1; dj++)
        for (int di = -1; di <= 1; di++) {
          int jj = (j + dj + JMT) % JMT, ii = (i + di + IMT) % IMT;
          acc += cf[(size_t)((dj + 1) * 3 + (di + 1)) * JMT * IMT +
                    I2(j, i)] *
                 x[I2(jj, ii)];
        }
      res[I2(j, i)] = acc;
    }
  for (int i = 0; i < IMT; i++) {
    res[I2(0, i)] = 0.0;
    res[I2(JMT - 1, i)] = 0.0;
  }
  for (int j = 0; j < JMT; j++) {
    res[I2(j, 0)] = 0.0;
    res[I2(j, IMT - 1)] = 0.0;
  }
}

static double dot2(const double *a, const double *b) {
  double s = 0.0;
  for (int j = 1; j < JMT - 1; j++)
    for (int i = 1; i < IMT - 1; i++) s += a[I2(j, i)] * b[I2(j, i)];
  return s;
}

static double absmax(const double *a) {
  double m = 0.0;
  for (size_t q = 0; q < (size_t)JMT * IMT; q++)
    if (fabs(a[q]) > m) m = fabs(a[q]);
  return m;
}

int main(int argc, char **argv) {
  if (argc < 3) return 1;
  FILE *f = fopen(argv[1], "rb");
  if (!f) return 1;
  int hdr[5];
  if (fread(hdr, sizeof(int), 5, f) != 5) return 1;
  JMT = hdr[0]; IMT = hdr[1]; NISLE = hdr[2]; IMAIN = hdr[3];
  MAXIT = hdr[4];
  if (fread(&TOL, sizeof(double), 1, f) != 1) return 1;

  size_t n2 = (size_t)JMT * IMT;
  double *cf = rd(f, 9 * n2);
  double *guess = rd(f, n2);
  double *forc = rd(f, n2);
  double *pidd = rd(f, n2);
  double *cnt = NISLE > 0 ? rd(f, NISLE) : NULL;
  fclose(f);
  PID = malloc(n2 * sizeof(int));
  for (size_t q = 0; q < n2; q++) PID[q] = (int)pidd[q];
  CNT = cnt;

  double *sums = malloc((NISLE > 0 ? NISLE : 1) * sizeof(double));
  double *dpsi = malloc(n2 * 8), *z = malloc(n2 * 8),
         *w = malloc(n2 * 8), *res = malloc(n2 * 8),
         *zres = malloc(n2 * 8), *s = calloc(n2, 8),
         *As = malloc(n2 * 8), *tmp = malloc(n2 * 8);

  memcpy(dpsi, guess, n2 * 8);
  border(dpsi);

  /* make_inv: diagonal, island-summed, inverted where nonzero */
  for (size_t q = 0; q < n2; q++) z[q] = cf[4 * n2 + q];
  sum_dist(z, sums);
  for (size_t q = 0; q < n2; q++)
    z[q] = z[q] != 0.0 ? 1.0 / z[q] : 0.0;
  border(z);

  /* constant-mode deflation vector: ones on the active set */
  for (size_t q = 0; q < n2; q++) w[q] = z[q] != 0.0 ? 1.0 : 0.0;
  border(w);
  double ww = dot2(w, w);

#define DEFLATE(x)                                                     \
  do {                                                                 \
    double c_ = dot2(x, w) / ww;                                       \
    for (size_t q_ = 0; q_ < n2; q_++) x[q_] -= c_ * w[q_];            \
  } while (0)

  apply_op9(cf, dpsi, tmp);
  for (size_t q = 0; q < n2; q++) res[q] = forc[q] - tmp[q];
  for (int i = 0; i < IMT; i++) {
    res[I2(0, i)] = 0.0;
    res[I2(JMT - 1, i)] = 0.0;
  }
  border(res);
  DEFLATE(res);

  /* inv_op(res) for the trivial-convergence check */
  for (size_t q = 0; q < n2; q++) zres[q] = z[q] * res[q];
  sum_dist(zres, sums);
  border(zres);
  int trivially_done = 100.0 * absmax(zres) < TOL;

  double betakm1 = 1.0, step = 0.0, step1 = 0.0;
  double est = 100.0 * absmax(zres);
  int done = trivially_done, k = 0;

  while (!done && k < MAXIT) {
    k += 1;
    for (size_t q = 0; q < n2; q++) zres[q] = z[q] * res[q];
    sum_dist(zres, sums);
    border(zres);
    DEFLATE(zres);
    double betak = dot2(zres, res);
    double denom_b = fabs(betakm1) > 0.0 ? betakm1 : 1.0;
    for (size_t q = 0; q < n2; q++)
      s[q] = zres[q] + (betak / denom_b) * s[q];
    apply_op9(cf, s, As);
    border(As);
    double sAs = dot2(s, As);
    int safe = fabs(sAs) > fabs(betak) * 1.0e-10;
    double alpha = safe ? betak / sAs : 0.0;
    for (size_t q = 0; q < n2; q++) {
      dpsi[q] += alpha * s[q];
      res[q] -= alpha * As[q];
    }
    avg_dist(res, sums);
    border(res);
    DEFLATE(res);
    double smax = absmax(s);
    step = fabs(alpha) * smax;
    if (k == 1) step1 = step;
    int small = step < TOL;
    double rate = 0.0;
    if (k > 1 && small) {
      double r = step / step1;
      if (r < 1e-300) r = 1e-300;
      rate = exp(log(r) / (k - 1 > 1 ? k - 1 : 1));
    }
    if (k == 1)
      est = step;
    else if (small)
      est = step * rate / (1.0 - rate);
    done = (k == 1) ? (step < TOL) : (small && est < TOL);
    done = done || !safe;
    betakm1 = betak;
  }

  DEFLATE(dpsi);

  FILE *g = fopen(argv[2], "wb");
  fwrite(dpsi, sizeof(double), n2, g);
  double tail[2] = {(double)k, (double)(done || trivially_done)};
  fwrite(tail, sizeof(double), 2, g);
  fclose(g);
  return 0;
}
