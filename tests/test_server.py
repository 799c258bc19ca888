"""HTTP service tests (server/fhe_controller.h + server/test.sh
analogue): full REST roundtrip -- context, keygen, encrypt, gate,
decrypt -- plus error paths."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from fhe_tpu import server as fhe_server


@pytest.fixture(scope="module")
def srv():
    from http.server import ThreadingHTTPServer
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), fhe_server.FheHandler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(base, path, payload):
    req = urllib.request.Request(
        base + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_full_roundtrip(srv):
    with urllib.request.urlopen(srv + "/health") as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"

    _, c = _post(srv, "/context", {"param_set": "TOY"})
    cid = c["context_id"]
    _, k = _post(srv, "/keygen", {"context_id": cid, "seed": 7})
    kid = k["key_id"]
    _, e1 = _post(srv, "/encrypt", {"context_id": cid, "key_id": kid,
                                    "bits": [0, 0, 1, 1], "seed": 1})
    _, e2 = _post(srv, "/encrypt", {"context_id": cid, "key_id": kid,
                                    "bits": [0, 1, 0, 1], "seed": 2})
    code, g = _post(srv, "/gate", {"context_id": cid, "key_id": kid,
                                   "gate": "AND", "ct1": e1["ciphertext"],
                                   "ct2": e2["ciphertext"]})
    assert code == 200
    _, d = _post(srv, "/decrypt", {"context_id": cid, "key_id": kid,
                                   "ciphertext": g["ciphertext"]})
    assert d["bits"] == [0, 0, 0, 1]
    # NOT endpoint
    _, nt = _post(srv, "/not", {"context_id": cid,
                                "ciphertext": g["ciphertext"]})
    _, d2 = _post(srv, "/decrypt", {"context_id": cid, "key_id": kid,
                                    "ciphertext": nt["ciphertext"]})
    assert d2["bits"] == [1, 1, 1, 0]


def test_error_paths(srv):
    code, r = _post(srv, "/keygen", {"context_id": "nope"})
    assert code in (400, 500) and "error" in r
    code, r = _post(srv, "/nosuch", {})
    assert code == 404
    code, r = _post(srv, "/context", {"param_set": "NOT_A_SET"})
    assert code in (400, 500) and "error" in r


def test_v1_route_aliases(srv):
    """The reference controller's verbatim /v1/* routes
    (fhe_controller.h:242-254) map onto the flat endpoints."""
    _, r = _post(srv, "/v1/context/create", {"param_set": "TOY"})
    cid = r["context_id"]
    _, r = _post(srv, "/v1/keys/generate", {"context_id": cid})
    kid = r["key_id"]
    _, r = _post(srv, "/v1/encrypt",
                 {"context_id": cid, "key_id": kid, "bits": [1, 0]})
    c1 = r["ciphertext"]
    _, r = _post(srv, "/v1/encrypt",
                 {"context_id": cid, "key_id": kid, "bits": [1, 1]})
    c2 = r["ciphertext"]
    code, r = _post(srv, "/v1/eval/nand",
                    {"context_id": cid, "key_id": kid, "ct1": c1,
                     "ct2": c2})
    assert code == 200
    _, r = _post(srv, "/v1/decrypt", {"context_id": cid, "key_id": kid,
                                      "ciphertext": r["ciphertext"]})
    assert r["bits"] == [0, 1]
    with urllib.request.urlopen(srv + "/v1/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["contexts"] >= 1 and stats["keys"] >= 1
    code, _ = _post(srv, "/v1/eval/bogus", {})
    assert code == 404
