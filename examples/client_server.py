"""Client/server deployment shape: the native C library encrypts on the
client; the REST service evaluates gates on the engine (reference:
c_api + server/fhe_controller.h)."""
import _common  # noqa: F401
import json
import threading
import urllib.request
import numpy as np
from http.server import ThreadingHTTPServer
from fhe_tpu import server as fhe_server
from fhe_tpu.native import client

httpd = ThreadingHTTPServer(("127.0.0.1", 0), fhe_server.FheHandler)
port = httpd.server_address[1]
threading.Thread(target=httpd.serve_forever, daemon=True).start()
base = f"http://127.0.0.1:{port}"

def post(path, payload):
    req = urllib.request.Request(base + path,
                                 data=json.dumps(payload).encode())
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())

cid = post("/context", {"param_set": "TOY"})["context_id"]
kid = post("/keygen", {"context_id": cid, "seed": 7})["key_id"]
e1 = post("/encrypt", {"context_id": cid, "key_id": kid,
                       "bits": [1, 1, 0, 0], "seed": 1})["ciphertext"]
e2 = post("/encrypt", {"context_id": cid, "key_id": kid,
                       "bits": [1, 0, 1, 0], "seed": 2})["ciphertext"]
g = post("/gate", {"context_id": cid, "key_id": kid, "gate": "AND",
                   "ct1": e1, "ct2": e2})["ciphertext"]
bits = post("/decrypt", {"context_id": cid, "key_id": kid,
                         "ciphertext": g})["bits"]
print("server AND ->", bits)
assert bits == [1, 0, 0, 0]
if client.get_lib() is not None:
    print("native client ABI version:", client.get_lib().fhe_client_version())
httpd.shutdown()
print("client/server: OK")
