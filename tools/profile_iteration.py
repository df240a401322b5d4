import time, numpy as np
import relp_tpu, jax
from relp_tpu.io import import_lp
from relp_tpu.presolve.engine import presolve
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.simplex.core import solve_core
from relp_tpu.simplex.driver import _bucket
from relp_tpu.utils.config import SolverConfig

gf = import_lp('/root/reference/tests/netlib/problem_files/25FV47.SIF')
presolve(gf)
cf = build_computational_form(gf)
m, n = cf.m, cf.n
mp, npad = _bucket(m, 64), _bucket(n, 256)
print(f"shape ({m},{n}) -> ({mp},{npad})", flush=True)
A = np.zeros((mp, npad)); A[:m,:n] = cf.A.toarray()
b = np.zeros(mp); b[:m] = cf.b
c = np.zeros(npad); c[:n] = cf.c
lb = np.zeros(npad); ub = np.zeros(npad)
lb[:n] = cf.lb; ub[:n] = cf.ub

def timed(cfg, iters):
    t0 = time.perf_counter()
    out = jax.block_until_ready(solve_core(A, b, c, lb, ub, cfg=cfg, max_iter=iters))
    return time.perf_counter() - t0, int(out.it), int(out.status)

cfg = SolverConfig()
t, it, st_ = timed(cfg, 100)   # compile + 100
print(f"compile+100: {t:.2f}s", flush=True)
for iters in (1000, 2000, 4000):
    t, it, st_ = timed(cfg, iters)
    print(f"max_iter={iters}: {t:.3f}s it={it} status={st_} per_iter={t/it*1000:.3f}ms", flush=True)

cfg2 = SolverConfig(refactor_period=100000)
t, it, st_ = timed(cfg2, 100)
print(f"norefac compile+100: {t:.2f}s", flush=True)
for iters in (1000, 2000):
    t, it, st_ = timed(cfg2, iters)
    print(f"norefac max_iter={iters}: {t:.3f}s it={it} per_iter={t/it*1000:.3f}ms", flush=True)

# small-shape probe: afiro bucket
gf2 = import_lp('/root/reference/tests/netlib/problem_files/SC105.SIF')
presolve(gf2); cf2 = build_computational_form(gf2)
mp2, np2 = _bucket(cf2.m, 64), _bucket(cf2.n, 256)
A2 = np.zeros((mp2, np2)); A2[:cf2.m,:cf2.n] = cf2.A
b2 = np.zeros(mp2); b2[:cf2.m] = cf2.b
c2 = np.zeros(np2); c2[:cf2.n] = cf2.c
lb2 = np.zeros(np2); ub2 = np.zeros(np2); lb2[:cf2.n] = cf2.lb; ub2[:cf2.n] = cf2.ub
t0 = time.perf_counter(); out = jax.block_until_ready(solve_core(A2,b2,c2,lb2,ub2,cfg=cfg,max_iter=100)); print(f"sc105 compile+run: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter(); out = jax.block_until_ready(solve_core(A2,b2,c2,lb2,ub2,cfg=cfg,max_iter=1000)); t=time.perf_counter()-t0
print(f"sc105 ({mp2},{np2}): {t:.3f}s it={int(out.it)} per_iter={t/int(out.it)*1000:.3f}ms", flush=True)
