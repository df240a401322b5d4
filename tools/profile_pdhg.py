"""Per-op on-device profile of one PDHG iteration (VERDICT r2 item 1).

Builds the exact brick operator the driver's PDLP path builds for an XL
instance (Ruiz+PC scaled, RCM-permuted, 128-padded) and times, on the
current backend:

  - matvec / rmatvec alone (f64 bricks, f32 bricks, bf16 bricks)
  - one fused Halpern round (round_len steps) in f64 and f32
  - chunk dispatch overhead (rounds-per-call sweep)

Usage:  python tools/profile_pdhg.py [DFL001] [--rounds 4]
Writes a JSON summary to runs/profile_pdhg_<inst>_<backend>.json.
"""
import argparse
import json
import time

import numpy as np
import scipy.sparse as sp

import relp_tpu  # noqa: F401  (platform pin)
import jax
import jax.numpy as jnp

from relp_tpu.io import import_lp
from relp_tpu.presolve.engine import presolve
from relp_tpu.model.computational_form import build_computational_form
from relp_tpu.simplex.driver import _bucket, _round_up
from relp_tpu.ops.bricks import bricks_from_csc, bandwidth_perm, BrickMatrix

NETLIB = "/root/reference/tests/netlib/problem_files"


def build(inst):
    gf = import_lp(f"{NETLIB}/{inst}.SIF")
    presolve(gf)
    cf = build_computational_form(gf)
    m_pad, n_pad = _bucket(cf.m, 64), _bucket(cf.n, 256)
    csc0 = sp.csc_matrix(cf.A)
    # Ruiz + one PC pass (mirror driver._run_pdlp)
    S = abs(csc0).tocsr()
    d_r = np.ones(cf.m)
    d_c = np.ones(cf.n)
    for _ in range(10):
        rmax = np.asarray(S.max(axis=1).todense()).ravel()
        rs = 1.0 / np.sqrt(np.where(rmax > 0, rmax, 1.0))
        S = sp.diags(rs) @ S
        cmax = np.asarray(S.max(axis=0).todense()).ravel()
        cs = 1.0 / np.sqrt(np.where(cmax > 0, cmax, 1.0))
        S = S @ sp.diags(cs)
        d_r *= rs
        d_c *= cs
    csc_s = sp.diags(d_r) @ csc0 @ sp.diags(d_c)
    mp = max(_round_up(m_pad, 128), 128)
    np_ = max(_round_up(n_pad, 128), 128)
    rp, cp = bandwidth_perm(csc_s.tocsc())
    coo_p = csc_s.tocsc()[rp][:, cp].tocoo()
    csc_pad = sp.csc_matrix((coo_p.data, (coo_p.row, coo_p.col)), shape=(mp, np_))
    A = bricks_from_csc(csc_pad, mp, np_, bucket=lambda x: _bucket(x, 8))
    return A, cf, mp, np_


def timeit(f, *args, n=20, warm=2):
    for _ in range(warm):
        out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    t1 = time.perf_counter() - t0
    if t1 > 0.5:  # slow op: keep the probe bounded
        n = max(1, min(n, int(2.0 / t1)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inst", nargs="?", default="DFL001")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--round-len", type=int, default=256)
    args = ap.parse_args()

    backend = jax.default_backend()
    A, cf, mp, np_ = build(args.inst)
    res = {"inst": args.inst, "backend": backend, "m_pad": mp, "n_pad": np_,
           "nnz": int(cf.A.nnz)}
    rbytes = A.rdata.size * 8
    cbytes = A.cdata.size * 8
    res["rdata_mb_f64"] = rbytes / 1e6
    res["cdata_mb_f64"] = cbytes / 1e6
    res["brick_fill"] = cf.A.nnz / (A.rdata.size)
    print(json.dumps(res), flush=True)

    # host->device transfer cost of the operator (what a numpy-leaved
    # BrickMatrix pays on EVERY jit call) vs device-resident leaves
    t0 = time.perf_counter()
    A = jax.block_until_ready(jax.device_put(A))
    res["device_put_s"] = time.perf_counter() - t0
    res["tunnel_gbps"] = (rbytes + cbytes) / max(res["device_put_s"], 1e-9) / 1e9
    print(json.dumps({k: res[k] for k in ("device_put_s", "tunnel_gbps")}),
          flush=True)

    x64 = jnp.asarray(np.random.default_rng(0).standard_normal(np_))
    y64 = jnp.asarray(np.random.default_rng(1).standard_normal(mp))

    mv = jax.jit(lambda A, x: A.matvec(x))
    rmv = jax.jit(lambda A, y: A.rmatvec(y))
    t, _ = timeit(mv, A, x64)
    res["matvec_f64_us"] = t * 1e6
    res["matvec_f64_gbps"] = rbytes / t / 1e9
    t, _ = timeit(rmv, A, y64)
    res["rmatvec_f64_us"] = t * 1e6
    res["rmatvec_f64_gbps"] = cbytes / t / 1e9
    print(json.dumps({k: res[k] for k in list(res)[-4:]}), flush=True)

    # f32 and bf16 brick variants (device-resident)
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        A2 = jax.device_put(BrickMatrix(
            A.rdata.astype(dt), A.ridx, A.cdata.astype(dt), A.cidx, A.m, A.n))
        xb = x64.astype(dt)
        yb = y64.astype(dt)
        nb = A2.rdata.size * A2.rdata.dtype.itemsize
        t, _ = timeit(mv, A2, xb)
        res[f"matvec_{tag}_us"] = t * 1e6
        res[f"matvec_{tag}_gbps"] = nb / t / 1e9
        t, _ = timeit(rmv, A2, yb)
        res[f"rmatvec_{tag}_us"] = t * 1e6
        print(json.dumps({k: res[k] for k in list(res)[-2:]}), flush=True)

    # full Halpern rounds: f64 state vs f32 state (f32 bricks)
    from relp_tpu.fom.pdhg import solve_pdhg_chunk, initial_state, _power_norm

    b = jnp.zeros(mp)
    c = jnp.asarray(np.random.default_rng(2).standard_normal(np_)) * 0.01
    lb = jnp.zeros(np_)
    ub = jnp.full(np_, 10.0)
    eta0 = 0.9 / float(jax.jit(_power_norm)(A))

    def run_rounds(A_, b_, c_, lb_, ub_, eta, rounds):
        s = initial_state(A_, lb_, ub_, eta, dtype=b_.dtype)
        return solve_pdhg_chunk(A_, b_, c_, lb_, ub_, s,
                                round_len=args.round_len, max_rounds=rounds,
                                tol=0.0, variant="halpern")

    for dt, tag in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        A_ = A if dt == jnp.float64 else jax.device_put(BrickMatrix(
            A.rdata.astype(dt), A.ridx, A.cdata.astype(dt), A.cidx, A.m, A.n))
        cast = lambda v: v.astype(dt)  # noqa: E731
        f = jax.jit(lambda A_, b_, c_, l_, u_: run_rounds(
            A_, b_, c_, l_, u_, eta0, args.rounds))
        t, out = timeit(f, A_, cast(b), cast(c), cast(lb), cast(ub), n=3, warm=1)
        iters = args.rounds * args.round_len
        res[f"round_{tag}_iters_per_s"] = iters / t
        res[f"round_{tag}_us_per_iter"] = t / iters * 1e6
        print(json.dumps({k: res[k] for k in list(res)[-2:]}), flush=True)

    out_path = f"runs/profile_pdhg_{args.inst}_{backend}.json"
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
