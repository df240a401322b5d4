import numpy as np, relp_tpu, jax
from relp_tpu.io import import_lp
from relp_tpu.presolve.engine import presolve
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.simplex.core import solve_core
from relp_tpu.simplex.driver import _bucket
from relp_tpu.utils.config import SolverConfig

gf = import_lp('/root/reference/tests/netlib/problem_files/25FV47.SIF')
presolve(gf); cf = build_computational_form(gf)
mp, npad = _bucket(cf.m, 64), _bucket(cf.n, 256)
A = np.zeros((mp, npad)); A[:cf.m,:cf.n] = cf.A.toarray()
b = np.zeros(mp); b[:cf.m] = cf.b
c = np.zeros(npad); c[:cf.n] = cf.c
lb = np.zeros(npad); ub = np.zeros(npad); lb[:cf.n] = cf.lb; ub[:cf.n] = cf.ub
cfg = SolverConfig()
jax.block_until_ready(solve_core(A,b,c,lb,ub,cfg=cfg,max_iter=100))  # compile
with jax.profiler.trace('/tmp/jaxtrace'):
    jax.block_until_ready(solve_core(A,b,c,lb,ub,cfg=cfg,max_iter=500))
print('trace done')
