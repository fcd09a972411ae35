"""HTTP proving service: the delivery surface replacing the reference's
browser/WASM flow (D11).

The reference proves the voter circuit inside the client's browser via
halo2-wasm + a web worker (voter/frontend/wasm/src/lib.rs:39-66,
frontend/app/worker.js:95-168).  A TPU cannot run client-side, so the
TPU-native analogue is a proving SERVICE: the same config -> keygen ->
prove -> verify lifecycle exposed over HTTP (stdlib http.server -- no
new dependencies), with the proving key resident and witnesses rebound
per request (prover/plonk.py `rebind_witness`, mirroring how the
browser keeps its `Halo2Wasm` instance warm across proofs).

Endpoints (JSON):
  GET  /health          -> {"status": "ok", "circuits": [...]}
  POST /prove           {"circuit": "voter", "k": 13, "seed": 7}
                        -> {"proof": hex, "instances": [...], "ms": ...}
  POST /verify          {"circuit": "voter", "k": 13, "proof": hex,
                         "instances": [...]} -> {"valid": bool}

Run: python -m zksnap_tpu.server [port]  (default 8787)
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class _ProverPool:
    """Lazily-built, cached (circuit, k) proving keys + serialized prove.

    One prove at a time (the chip is a serial resource; the reference's
    wasm thread pool parallelizes WITHIN one proof the same way our
    kernels batch within one proof)."""

    def __init__(self):
        self._keys = {}
        self._lock = threading.Lock()

    def _get(self, circuit: str, k: int):
        key = (circuit, k)
        if key in self._keys:
            return self._keys[key]
        from .prover.plonk import keygen
        from .prover.srs import gen_srs
        from .trace import Context

        ctx, _ = self._synth(circuit, k, seed=0)
        pk = keygen(ctx, k, gen_srs(k))
        self._keys[key] = pk
        return pk

    @staticmethod
    def _synth(circuit: str, k: int, seed: int):
        import random

        from .trace import Context

        rng = random.Random(seed)
        ctx = Context(lookup_bits=min(14, k - 1))
        pub = []
        if circuit == "voter":
            from .circuits.voter import VoterFlags, voter_circuit
            from .natives import generate_random_voter_circuit_inputs

            inp = generate_random_voter_circuit_inputs(rng)
            voter_circuit(ctx, inp, pub, VoterFlags(check_plume=k >= 21))
        elif circuit == "state_transition":
            from .circuits.state_transition import state_transition_circuit
            from .natives import generate_wrapper_circuit_input

            _, sts = generate_wrapper_circuit_input(1, rng)
            state_transition_circuit(ctx, sts[0], pub)
        else:
            raise ValueError(f"unknown circuit {circuit!r}")
        return ctx, [c.value for c in pub]

    def prove(self, circuit: str, k: int, seed: int):
        from .prover.plonk import prove, rebind_witness

        with self._lock:
            pk = self._get(circuit, k)
            ctx, instances = self._synth(circuit, k, seed)
            t0 = time.time()
            proof = prove(rebind_witness(pk, ctx), instances)
            return proof, instances, time.time() - t0

    def verify(self, circuit: str, k: int, proof: bytes, instances):
        from .prover.plonk import verify
        from .prover.srs import gen_srs

        with self._lock:
            pk = self._get(circuit, k)
        srs = gen_srs(k)
        return verify(pk.vk, srs.g2, srs.tau_g2, instances, proof)


_POOL = _ProverPool()
CIRCUITS = ("voter", "state_transition")


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, obj):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet (print-based logging parity)
        pass

    def do_GET(self):
        if self.path == "/health":
            return self._json(200, {"status": "ok",
                                    "circuits": list(CIRCUITS)})
        return self._json(404, {"error": "not found"})

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            circuit = req.get("circuit", "voter")
            k = int(req.get("k", 13))
            if circuit not in CIRCUITS:
                return self._json(400, {"error": f"unknown circuit"})
            if self.path == "/prove":
                proof, inst, dt = _POOL.prove(circuit, k,
                                              int(req.get("seed", 0)))
                return self._json(200, {
                    "proof": proof.hex(),
                    "instances": [str(v) for v in inst],
                    "ms": round(dt * 1000, 1),
                })
            if self.path == "/verify":
                ok = _POOL.verify(
                    circuit, k, bytes.fromhex(req["proof"]),
                    [int(v) for v in req["instances"]])
                return self._json(200, {"valid": bool(ok)})
            return self._json(404, {"error": "not found"})
        except Exception as e:  # noqa: BLE001
            return self._json(500, {"error": f"{type(e).__name__}: {e}"})


def serve(port: int = 8787):
    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"zksnap_tpu proving service on :{port} "
          f"(circuits: {', '.join(CIRCUITS)})", flush=True)
    httpd.serve_forever()


if __name__ == "__main__":
    import sys

    serve(int(sys.argv[1]) if len(sys.argv) > 1 else 8787)
