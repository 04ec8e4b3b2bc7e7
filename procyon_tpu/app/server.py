"""Dependency-free HTTP retrieval server (stdlib http.server).

Same endpoint contract as app/main.py's FastAPI variant (POST /retrieve with
{task_desc, disease_desc, instruction_source_dataset, k}; GET /healthz) for
environments without fastapi/uvicorn.

Run: python -m procyon_tpu.app.server [--port 8000] [--synthetic]
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from procyon_tpu.inference.retrieval_service import RetrievalService


def make_handler(service: RetrievalService):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/retrieve":
                self._json(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "invalid JSON body"})
                return
            disease_desc = req.get("disease_desc")
            if not disease_desc:
                self._json(422, {"error": "disease_desc is required"})
                return
            source = req.get("instruction_source_dataset", "disgenet")
            if source not in ("disgenet", "omim"):
                self._json(422, {"error": "instruction_source_dataset must "
                                          "be disgenet or omim"})
                return
            k = int(req.get("k", 10))
            try:
                results = service.retrieve(
                    task_id=f"{source}_all_retrieval",
                    disease_desc=disease_desc, k=k)
            except Exception as e:  # surface model errors as 500s
                self._json(500, {"error": str(e)})
                return
            self._json(200, {"results": results})

        def log_message(self, fmt, *args):
            pass

    return Handler


def serve(service: RetrievalService, port: int = 8000, *,
          background: bool = False) -> Optional[ThreadingHTTPServer]:
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(service))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    httpd.serve_forever()
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--synthetic", action="store_true")
    args = p.parse_args()
    if args.synthetic:
        import os

        os.environ["PROCYON_SYNTHETIC"] = "1"
    from procyon_tpu.app.main import _build_service

    service = _build_service()
    print(f"serving on :{args.port}")
    serve(service, args.port)


if __name__ == "__main__":
    main()
