#!/usr/bin/env python3
"""Minimal HTTP inference server over an exported serving-artifact dir.

Completes the deployment story end-to-end: train -> export
(scripts/export_serving.py) -> serve. The server needs only jax + numpy
(load_serving restores the StableHLO artifacts to callables; no model
code, flax, or checkpoints on the serving host).

    python scripts/serve_artifacts.py --artifacts ./served_model --port 8432

Endpoints (arrays travel as .npy bytes, application/octet-stream):

  GET  /healthz            -> {"ok": true, "functions": [...]}
  GET  /manifest           -> manifest.json
  POST /reconstruct        body: uint8 NHWC .npy   -> float32 NHWC .npy
  POST /encode_codes       body: uint8 NHWC .npy   -> int32 codes .npy
                           (hierarchical: .npz with top/bottom)
  POST /decode_codes       body: int32 codes .npy (or .npz top/bottom)
                           -> float32 NHWC .npy
  POST /sample?seed=N      -> float32 NHWC .npy (fixed export batch)

Single-threaded by design: jax dispatch serializes on the device anyway,
and the artifact functions are jitted once at startup. The reference has
no serving path at all (SURVEY §1: deployment = re-import torch code +
checkpoint).
"""

import argparse
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _npy_bytes(*arrays) -> bytes:
    buf = io.BytesIO()
    if len(arrays) == 1:
        np.save(buf, np.asarray(arrays[0]))
    else:  # hierarchical code pairs
        np.savez(buf, top=np.asarray(arrays[0]),
                 bottom=np.asarray(arrays[1]))
    return buf.getvalue()


def _load_body(body: bytes):
    """.npy -> (array,); .npz -> (top, bottom)."""
    buf = io.BytesIO(body)
    if body[:4] == b"PK\x03\x04":  # zip magic = .npz
        z = np.load(buf)
        return (z["top"], z["bottom"])
    return (np.load(buf),)


def make_handler(fns, manifest):
    import jax

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload: bytes,
                  ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _send_json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def log_message(self, fmt, *args):  # quiet default access log
            pass

        def do_GET(self):
            path = self.path.split("?")[0]
            if path == "/healthz":
                self._send_json(200, {"ok": True,
                                      "functions": sorted(fns)})
            elif path == "/manifest":
                self._send_json(200, manifest)
            else:
                self._send_json(404, {"error": f"no route {path}"})

        def do_POST(self):
            path, _, query = self.path.partition("?")
            name = path.strip("/")
            if name not in fns:
                self._send_json(404, {"error": f"no function {name}",
                                      "functions": sorted(fns)})
                return
            try:
                if name == "sample":
                    seed = 0
                    for kv in query.split("&"):
                        if kv.startswith("seed="):
                            seed = int(kv.split("=", 1)[1])
                    out = fns["sample"](jax.random.PRNGKey(seed))
                else:
                    n = int(self.headers.get("Content-Length", 0))
                    args = _load_body(self.rfile.read(n))
                    out = fns[name](*args)
                out = out if isinstance(out, (tuple, list)) else (out,)
                self._send(200, _npy_bytes(*out))
            except Exception as e:  # surface the real contract violation
                self._send_json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(artifacts: str, host: str, port: int) -> HTTPServer:
    from movae_tpu.serving import load_manifest, load_serving

    fns = load_serving(artifacts)
    manifest = load_manifest(artifacts)
    httpd = HTTPServer((host, port), make_handler(fns, manifest))
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--artifacts", required=True,
                    help="exported serving dir (scripts/export_serving.py)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8432)
    args = ap.parse_args()

    from movae_tpu.utils import (enable_persistent_compilation_cache,
                                 require_live_backend)

    enable_persistent_compilation_cache()
    require_live_backend()  # tunnel outages HANG backend init — probe first

    httpd = serve(args.artifacts, args.host, args.port)
    print(f"serving {args.artifacts} on http://{args.host}:{args.port} "
          f"(endpoints: /healthz /manifest + POST per function)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
