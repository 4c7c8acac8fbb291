// Calibrated stand-in for the reference's per-rank hot loop, used by bench.py
// to compute "vs_baseline" because the Fortran+PETSc reference cannot be
// built in this image (no mpif90 / PETSc).
//
// Implements the same work per particle per RK substep as
// /root/reference/src/pic1dp_interaction.F90:
//   - gather E with hat (CIC) weights                    (:239-258)
//   - push x                                             (:260-263)
//   - push w with the analytic -f0'/f0 (bump-on-tail)    (:293-321)
//   - push v                                             (:333-338)
//   - deposit w onto the grid with hat weights           (:96-114)
// in double precision (PetscReal) over a serial particle loop, which is how
// the reference spends its time (SURVEY.md section 3.3).  bench.py multiplies
// the measured single-core rate by the reference's default 4 MPI ranks
// (Makefile NPE_RUN) to estimate one-host throughput.
//
// Output: one line "<pushes_per_second>" on stdout.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char **argv) {
  const int64_t np = argc > 1 ? atoll(argv[1]) : 2000000;
  const int nx = argc > 2 ? atoi(argv[2]) : 192;
  const int substeps = argc > 3 ? atoi(argv[3]) : 10;
  const double lx = 2.0 * M_PI / 0.36, dt = 0.05;
  const double charge = -1.0, mass = 1.0;
  // bump-on-tail parameters (src/pic1dp_input.F90 defaults)
  const double t1 = 1.0, t2 = 0.25, v0 = 4.5, nb = 0.1;

  std::vector<double> x(np), v(np), p(np), w(np), E(nx), rho(nx);
  uint64_t s = 88172645463325252ull;
  auto rnd = [&]() {  // xorshift64, uniform in [0,1)
    s ^= s << 13; s ^= s >> 7; s ^= s << 17;
    return (double)(s >> 11) * (1.0 / 9007199254740992.0);
  };
  for (int64_t i = 0; i < np; ++i) {
    x[i] = rnd() * lx;
    v[i] = (rnd() - 0.5) * 16.0;
    p[i] = rnd();
    w[i] = (rnd() - 0.5) * 1e-5;
  }
  for (int i = 0; i < nx; ++i) E[i] = 1e-5 * cos(2.0 * M_PI * i / nx);

  auto start = std::chrono::steady_clock::now();
  for (int it = 0; it < substeps; ++it) {
    const double hdt = (it & 1) ? dt : 0.5 * dt;
    // gather + push (interaction_push_particle)
    for (int64_t i = 0; i < np; ++i) {
      double sx = x[i] / lx * nx;
      int ix = (int)sx;
      double fx = sx - ix;
      int ix0 = ((ix % nx) + nx) % nx, ix1 = (ix0 + 1) % nx;
      double e = (1.0 - fx) * E[ix0] + fx * E[ix1];
      x[i] += hdt * v[i];
      x[i] -= lx * floor(x[i] / lx);
      // -f0'/f0 for bump-on-tail (two shifted Maxwellian components)
      double vv = v[i];
      double fb = nb * exp(-(vv - v0) * (vv - v0) / (2.0 * t2)) / sqrt(t2);
      double fm = (1.0 - nb) * exp(-vv * vv / (2.0 * t1)) / sqrt(t1);
      double dlnf = (fm * vv / t1 + fb * (vv - v0) / t2) / (fm + fb);
      w[i] += hdt * (p[i] - w[i]) * e * dlnf * charge / mass;
      v[i] += hdt * e * charge / mass;
    }
    // deposit (interaction_collect_charge)
    for (int i = 0; i < nx; ++i) rho[i] = 0.0;
    for (int64_t i = 0; i < np; ++i) {
      double sx = x[i] / lx * nx;
      int ix = (int)sx;
      double fx = sx - ix;
      int ix0 = ((ix % nx) + nx) % nx, ix1 = (ix0 + 1) % nx;
      rho[ix0] += (1.0 - fx) * w[i];
      rho[ix1] += fx * w[i];
    }
  }
  auto stop = std::chrono::steady_clock::now();
  double sec = std::chrono::duration<double>(stop - start).count();
  // keep the compiler honest
  volatile double sink = rho[0] + v[np / 2] + w[np - 1];
  (void)sink;
  printf("%.6e\n", (double)np * substeps / sec);
  return 0;
}
