"""Generate tests/vectors/transcript_v1.json -- the frozen wire-protocol
golden vectors (VERDICT r2 item 7).

Run ONCE; the output is committed and asserted forever by
tests/test_protocol_vectors.py.  Regenerating is a BREAKING protocol
change and must be done knowingly (bump the version suffix).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")


def build_fixed_circuit():
    """The frozen K=7 reference circuit (mul + add + range + select)."""
    from zksnap_tpu.trace import Context

    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(7)
    b = ctx.load_witness(9)
    c = ctx.mul(a, b)
    d = ctx.add(c, ctx.load_constant(5))
    ctx.range_check(ctx.load_witness(37), 6)
    sel = ctx.load_witness(1)
    e = ctx.select(a, b, sel)
    ctx.constrain_equal(e, a)
    ctx.expose_public(d)
    return ctx


def main():
    from zksnap_tpu.curves.native import BN254_G1, AffinePoint
    from zksnap_tpu.hash.poseidon import PoseidonNative, default_spec
    from zksnap_tpu.prover.plonk import keygen, prove, verify
    from zksnap_tpu.prover.srs import gen_srs
    from zksnap_tpu.prover.transcript import Transcript, fe_to_limbs

    out = {"version": 1}

    # -- poseidon permutation + sponge ----------------------------------
    spec = default_spec()
    state_in = [1, 2, 3]
    out["poseidon_permute"] = {
        "in": [str(v) for v in state_in],
        "out": [str(v) for v in spec.permute_native(list(state_in))],
    }
    sp = PoseidonNative()
    sp.update([11, 22, 33])
    sq1 = sp.squeeze_and_reset()
    sp.update([44])
    sq2 = sp.squeeze_and_reset()
    out["poseidon_sponge"] = {
        "updates": [["11", "22", "33"], ["44"]],
        "squeezes": [str(sq1), str(sq2)],
    }

    # -- transcript absorb/challenge sequence ----------------------------
    tr = Transcript()
    tr.absorb_scalar(5)
    g = AffinePoint.generator(BN254_G1)
    tr.write_point(g)
    tr.write_scalar(123456789)
    c1 = tr.challenge()
    tr.write_point(AffinePoint.identity(BN254_G1))
    c2 = tr.challenge()
    out["transcript"] = {
        "absorb_scalar": "5",
        "write_point": [hex(g.x), hex(g.y)],
        "write_scalar": "123456789",
        "challenge_1": hex(c1),
        "identity_then_challenge_2": hex(c2),
        "stream_hex": tr.proof().hex(),
        "point_limbs_g_x": [str(v) for v in fe_to_limbs(g.x)],
    }

    # -- frozen K=7 proof -------------------------------------------------
    srs = gen_srs(7)
    ctx = build_fixed_circuit()
    pk = keygen(ctx, 7, srs)
    # vk digest: sha256 over the sorted preprocessed commitment encodings
    h = hashlib.sha256()
    for name in sorted(pk.vk.commitments):
        pt = pk.vk.commitments[name]
        x, y = (0, 0) if pt.is_identity() else (pt.x, pt.y)
        h.update(name.encode() + x.to_bytes(32, "little")
                 + y.to_bytes(32, "little"))
    vk_digest = h.hexdigest()
    instances = [68]
    proof = prove(pk, instances)
    assert verify(pk.vk, srs.g2, srs.tau_g2, instances, proof)
    out["proof_k7"] = {
        "srs_seed": "dev",
        "k": 7,
        "instances": [str(v) for v in instances],
        "vk_sha256": vk_digest,
        "vk_shape": {
            "n_advice": pk.vk.n_advice, "n_lookup": pk.vk.n_lookup,
            "n_perm": pk.vk.n_perm, "n_z": pk.vk.n_z,
            "usable": pk.vk.usable, "ext_log": pk.vk.ext_log,
        },
        "proof_hex": proof.hex(),
        "proof_len": len(proof),
    }

    path = os.path.join("tests", "vectors", "transcript_v1.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path} (proof {len(proof)} bytes, vk {vk_digest[:16]}...)")


if __name__ == "__main__":
    main()
