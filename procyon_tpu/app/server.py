"""Dependency-free HTTP serving (stdlib http.server).

Same endpoint contract as app/main.py's FastAPI variant (POST /retrieve with
{task_desc, disease_desc, instruction_source_dataset, k}; GET /healthz) for
environments without fastapi/uvicorn — plus POST /generate, which the
reference app does not offer (its service is retrieval-only and serves one
request per forward, /root/reference/procyon/app/main.py:56-80): generation
requests from concurrent HTTP clients are admitted into ONE
inference/serving.ContinuousBatcher (paged pool, continuous batching) by a
single driver thread, so simultaneous requests share decode rounds instead
of queueing behind each other.

POST /generate {"tokens": [...], "max_new": 32, "eos_id": null}
             -> {"tokens": [...]}   (token-level; tokenize client-side)

Run: python -m procyon_tpu.app.server [--port 8000] [--synthetic]
"""

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from procyon_tpu.inference.retrieval_service import RetrievalService


class GenerationService:
    """Thread-safe facade over ContinuousBatcher for HTTP handlers: each
    request thread submits and blocks on its own event; one driver thread
    ticks the batcher whenever work exists (requests arriving between
    ticks join the next round — the batcher's whole design)."""

    def __init__(self, batcher):
        self.batcher = batcher
        self._cv = threading.Condition()
        self._events = {}
        self._results = {}
        self._thread = threading.Thread(target=self._drive, daemon=True)
        self._thread.start()

    def generate(self, prompt, max_new=32, eos_id=None, timeout=300.0):
        with self._cv:
            rid = self.batcher.submit(list(prompt), max_new=max_new,
                                      eos_id=eos_id)
            ev = self._events[rid] = threading.Event()
            self._cv.notify()
        if not ev.wait(timeout):
            raise TimeoutError(f"request {rid} timed out")
        with self._cv:
            return self._results.pop(rid)

    def _drive(self):
        while True:
            with self._cv:
                while not (self.batcher.queue or self.batcher.live
                           or self.batcher._inflight):
                    self._cv.wait()
                self.batcher.tick()
                for rid in list(self.batcher.done):
                    ev = self._events.pop(rid, None)
                    if ev is not None:
                        self._results[rid] = self.batcher.done.pop(rid)
                        ev.set()


def make_handler(service: RetrievalService,
                 gen: Optional[GenerationService] = None):
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
            if self.path == "/generate":
                self._generate()
                return
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

        def _generate(self):
            if gen is None:
                self._json(503, {"error": "generation service not "
                                          "configured (retrieval-only)"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._json(400, {"error": "invalid JSON body"})
                return
            tokens = req.get("tokens")
            if not isinstance(tokens, list) or not tokens:
                self._json(422, {"error": "tokens (non-empty int list) "
                                          "is required"})
                return
            try:
                out = gen.generate(
                    [int(t) for t in tokens],
                    max_new=int(req.get("max_new", 32)),
                    eos_id=(None if req.get("eos_id") is None
                            else int(req["eos_id"])))
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            self._json(200, {"tokens": [int(t) for t in out]})

        def log_message(self, fmt, *args):
            pass

    return Handler


def serve(service: RetrievalService, port: int = 8000, *,
          gen: Optional[GenerationService] = None,
          background: bool = False) -> Optional[ThreadingHTTPServer]:
    httpd = ThreadingHTTPServer(("0.0.0.0", port),
                                make_handler(service, gen))
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
