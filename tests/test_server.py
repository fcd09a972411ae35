"""Proving-service surface (server.py) -- the browser/WASM flow analogue
(worker.js:131-168 mock -> prove -> verify lifecycle over HTTP)."""

import json
import threading
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def service():
    from http.server import ThreadingHTTPServer

    from zksnap_tpu.server import Handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, path, obj):
    req = urllib.request.Request(
        url + path, json.dumps(obj).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_health(service):
    with urllib.request.urlopen(service + "/health") as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"
    assert "voter" in out["circuits"]


@pytest.mark.slow  # full voter keygen+prove at k=13 (~minutes cold)
def test_prove_verify_roundtrip(service):
    out = _post(service, "/prove", {"circuit": "voter", "k": 13, "seed": 3})
    assert len(out["instances"]) == 30
    chk = _post(service, "/verify", {
        "circuit": "voter", "k": 13, "proof": out["proof"],
        "instances": out["instances"]})
    assert chk["valid"] is True
    # tampered proof must fail
    bad = bytearray(bytes.fromhex(out["proof"]))
    bad[40] ^= 1
    chk2 = _post(service, "/verify", {
        "circuit": "voter", "k": 13, "proof": bytes(bad).hex(),
        "instances": out["instances"]})
    assert chk2["valid"] is False


def test_bad_circuit_rejected(service):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(service, "/prove", {"circuit": "nope"})
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())
