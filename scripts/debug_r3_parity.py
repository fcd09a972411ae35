"""Round-3 debug: parity of the new coefficient-form primitives against
the old evaluation-form path, at K=7.  Run on CPU."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import secrets

from zksnap_tpu.fields.field import bn254_fr
from zksnap_tpu.fields.common import ints_to_limbs
from zksnap_tpu.prover.poly_device import (
    batch_eval, coeffs_to_evals, coset_evals, coset_extended_evals,
    eval_coeffs_list, evals_to_coeffs, pow_series, to_device_poly,
    mont_to_canonical, commit_evals, rlc, rlc_list,
)
from zksnap_tpu.poly.domain import domain

FR = bn254_fr()
P = FR.p
K = 7
N = 1 << K
E_LOG = 2
E = 1 << E_LOG

vals = [secrets.randbelow(P) for _ in range(N)]
f_ev = to_device_poly(vals)

# 1. omega consistency: domain(k).omega == domain(k+e_log).omega^E
wk = domain(K).omega
wke = domain(K + E_LOG).omega
assert pow(wke, E, P) == wk, "omega tower inconsistent"
print("1. omega tower ok")

# 2. evals_to_coeffs/coeffs_to_evals roundtrip
coeffs = evals_to_coeffs(f_ev, K)
back = coeffs_to_evals(coeffs, K)
assert FR.from_mont(f_ev) == FR.from_mont(back), "iNTT/NTT roundtrip fails"
print("2. roundtrip ok")

# 3. eval_coeffs_list vs batch_eval vs host horner
x = secrets.randbelow(P)
new_v = eval_coeffs_list([coeffs], x, K)[0]
old_v = batch_eval(jnp.stack([f_ev]), x, K)[0]
cints = FR.from_mont(coeffs)
host = 0
for c in reversed(cints):
    host = (host * x + c) % P
assert new_v == host, f"eval_coeffs_list {new_v} != horner {host}"
assert old_v == host, f"batch_eval {old_v} != horner {host}"
print("3. point eval ok")

# 4. coset_evals vs coset_extended_evals slices
ext_old = FR.from_mont(coset_extended_evals(f_ev, K, E_LOG))
g = FR.generator
for j in range(E):
    s = g * pow(wke, j, P) % P
    sp = pow_series(s, N)
    new_j = FR.from_mont(coset_evals(coeffs, sp, K))
    old_j = ext_old[j::E]
    assert new_j == old_j, f"coset {j} mismatch"
print("4. per-coset evals ok")

# 5. _coset_tables vs host recomputation
from zksnap_tpu.prover.plonk import _coset_tables

usable = N - 10
ne = N * E
x_vals = [g * pow(wke, i, P) % P for i in range(ne)]
for j in range(E):
    xd, l0d, lud, zhinvd = _coset_tables(K, E_LOG, j, usable)
    xs = FR.from_mont(xd)
    assert xs == x_vals[j::E], f"x table coset {j}"
    zh = (pow(x_vals[j], N, P) - 1) % P
    assert FR.from_mont(zhinvd[None, :])[0] == pow(zh, -1, P), "zhinv"
    l0 = [zh * pow(N * (xv - 1) % P, -1, P) % P for xv in x_vals[j::E]]
    assert FR.from_mont(l0d) == l0, f"l0 coset {j}"
    wu = pow(wk, usable, P)
    lu = [wu * zh % P * pow(N * (xv - wu) % P, -1, P) % P
          for xv in x_vals[j::E]]
    assert FR.from_mont(lud) == lu, f"lu coset {j}"
print("5. coset tables ok")

# 6. projective vs jacobian commit
from zksnap_tpu.curves.jacobian import bn254_ops, JacPoint
from zksnap_tpu.msm.pippenger import msm_impl
from zksnap_tpu.prover.srs import gen_srs

srs = gen_srs(K)
can = mont_to_canonical(f_ev)
c_proj = commit_evals(srs.g1_lagrange, can)
jops = bn254_ops()
n_bits = 254
c = max(4, min(16, N.bit_length() - 4))
nw = -(-254 // c)
r_jac = msm_impl(jops, JacPoint(srs.g1_lagrange.x[:N], srs.g1_lagrange.y[:N],
                                srs.g1_lagrange.z[:N]), can, c, nw)
a1 = jops.to_affine_host(c_proj)[0]
a2 = jops.to_affine_host(r_jac)[0]
assert a1 == a2, f"proj commit {a1} != jac {a2}"
print("6. projective commit ok")

# 7. rlc_list vs rlc
cs = [secrets.randbelow(P) for _ in range(3)]
polys = [to_device_poly([secrets.randbelow(P) for _ in range(N)])
         for _ in range(3)]
r_new = FR.from_mont(rlc_list(polys, cs, K))
r_old = FR.from_mont(rlc(jnp.stack(polys), cs, K))
assert r_new == r_old, "rlc mismatch"
print("7. rlc ok")

print("ALL PARITY CHECKS PASS")
