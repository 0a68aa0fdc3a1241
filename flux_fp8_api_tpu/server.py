"""Dependency-free HTTP server with the reference API surface.

The reference serves via FastAPI+uvicorn (api.py, main.py:195). This module provides the
same endpoints on the stdlib ``ThreadingHTTPServer`` so the framework serves on a bare
TPU-VM image with no extra wheels; ``flux_fp8_api_tpu.api`` remains the FastAPI app for
environments that have it (same schemas — both delegate to the pipeline).

Endpoints (same request/response shapes as reference api.py:27-122):
- POST /generate  {prompt, width, height, num_steps, guidance, seed, strength,
                   init_image} → image/jpeg bytes (+ ``X-Seed``: the seed used,
                   so clients get the reference UI's used-seed readback —
                   reference main_gr.py:28-42 returns it alongside the image)
- POST /lora      {action: load|unload, path, name, scale} → JSON status
- GET  /          browser UI (webui.py — the wheel-free Gradio twin)
- GET  /health, /metrics — TPU-stack extras

A single lock serializes generate/lora (the reference relies on sync handlers for
this — SURVEY.md §5 race note; here it's explicit).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

MAX_RAND = 2**32 - 1

GENERATE_DEFAULTS: Dict[str, Any] = {
    "width": 720,
    "height": 1024,
    "num_steps": 24,
    "guidance": 3.5,
    "seed": None,
    "strength": 1.0,
    "init_image": None,
    # opt-in step cache, e.g. {"mode": "dynamic", "threshold": 0.25} —
    # sampling.CacheConfig; a TPU-side extra over the reference api.py schema
    "cache": None,
}


class PipelineServer:
    def __init__(self, pipeline, host: str = "0.0.0.0", port: int = 8088):
        self.pipeline = pipeline
        self.host = host
        self.port = port
        self.lock = threading.Lock()
        self.metrics = {"requests": 0, "images": 0, "total_seconds": 0.0, "last_seconds": None}
        self.last_timings: Dict[str, Any] = {}  # last COMPLETED request (lock-snapshotted)
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------------- handlers
    def handle_generate(self, body: Dict[str, Any]):
        # Contract: ALWAYS returns a 4-tuple (status, content_type, payload,
        # headers) — error paths included — so callers can unpack uniformly.
        if "prompt" not in body:
            return 400, "application/json", json.dumps(
                {"status": "error", "message": "prompt is required"}
            ).encode(), {}
        args = dict(GENERATE_DEFAULTS)
        args.update({k: v for k, v in body.items() if k in GENERATE_DEFAULTS or k == "prompt"})
        if args.get("seed") is None:
            args["seed"] = int(np.random.randint(0, MAX_RAND))
        try:
            # validate the cache spec up front: a typo'd option is a client error
            # (400), not a server fault
            from .sampling import CacheConfig

            args["cache"] = CacheConfig.parse(args.get("cache"))
        except (TypeError, ValueError) as e:
            return 400, "application/json", json.dumps(
                {"status": "error", "message": str(e)}
            ).encode(), {}
        t0 = time.perf_counter()
        with self.lock:
            out = self.pipeline.generate(silent=True, **args)
            # metrics update under the lock: ThreadingHTTPServer handlers race on
            # the non-atomic read-modify-writes otherwise
            dt = time.perf_counter() - t0
            self.metrics["requests"] += 1
            self.metrics["images"] += 1
            self.metrics["total_seconds"] += dt
            self.metrics["last_seconds"] = dt
            # snapshot per-phase timings under the lock so /metrics never reads a
            # half-updated mix from the next in-flight request
            self.last_timings = dict(getattr(self.pipeline, "timings", {}))
        return 200, "image/jpeg", out.getvalue(), {"x-seed": str(args["seed"])}

    def handle_lora(self, body: Dict[str, Any]):
        action = body.get("action", "load")
        try:
            if action == "load":
                if not body.get("path"):
                    return 400, "application/json", json.dumps(
                        {"status": "error", "message": "Lora path is required"}
                    ).encode()
                with self.lock:
                    self.pipeline.load_lora(
                        lora_path=body["path"],
                        scale=body.get("scale", 1.0),
                        name=body.get("name"),
                    )
                msg = f"LoRA {body['path']} loaded successfully"
            elif action == "unload":
                ident = body.get("name") or body.get("path")
                if not ident:
                    return 400, "application/json", json.dumps(
                        {"status": "error", "message": "Lora path or name is required"}
                    ).encode()
                with self.lock:
                    self.pipeline.unload_lora(ident)
                msg = f"LoRA {ident} unloaded successfully"
            else:
                return 400, "application/json", json.dumps(
                    {"status": "error", "message": f"Invalid action {action}"}
                ).encode()
            return 200, "application/json", json.dumps(
                {"status": "success", "message": msg}
            ).encode()
        except Exception as e:  # reference api.py:105-121 envelope
            return 500, "application/json", json.dumps(
                {"status": "error", "message": str(e)}
            ).encode()

    def handle_health(self):
        return 200, "application/json", json.dumps(
            {
                "status": "ok" if self.pipeline is not None else "loading",
                "model": getattr(self.pipeline, "name", None),
                "loras": [l.name for l in getattr(self.pipeline, "loras", [])],
            }
        ).encode()

    def handle_metrics(self):
        out = dict(self.metrics)
        if out["requests"]:
            out["avg_seconds"] = out["total_seconds"] / out["requests"]
        # last-request per-phase timings incl. the reference's headline denoise
        # it/s metric (flux_pipeline.py:628-630 tqdm rate; SURVEY.md §5 tracing).
        # self.last_timings is rebound atomically under the generate lock — never
        # a torn mix of an in-flight request's phases with the previous one's.
        out.update(self.last_timings)
        return 200, "application/json", json.dumps(out).encode()

    # --------------------------------------------------------------------- server
    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet
                pass

            def _send(self, status: int, ctype: str, payload: bytes, headers=None):
                self.send_response(status)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(payload)))
                for k, v in (headers or {}).items():
                    self.send_header(k, v)
                self.end_headers()
                self.wfile.write(payload)

            def do_GET(self):
                if self.path == "/health":
                    self._send(*server.handle_health())
                elif self.path == "/metrics":
                    self._send(*server.handle_metrics())
                elif self.path in ("/", "/index.html"):
                    from .webui import render_index

                    self._send(200, "text/html; charset=utf-8",
                               render_index(server.pipeline))
                else:
                    self._send(404, "application/json", b'{"detail":"Not Found"}')

            def do_POST(self):
                length = int(self.headers.get("content-length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                except json.JSONDecodeError:
                    self._send(400, "application/json", b'{"detail":"invalid JSON"}')
                    return
                try:
                    if self.path == "/generate":
                        self._send(*server.handle_generate(body))
                    elif self.path == "/lora":
                        self._send(*server.handle_lora(body))
                    else:
                        self._send(404, "application/json", b'{"detail":"Not Found"}')
                except BrokenPipeError:
                    pass
                except Exception as e:
                    self._send(
                        500,
                        "application/json",
                        json.dumps({"status": "error", "message": str(e)}).encode(),
                    )

        return Handler

    def _bind(self):
        self._httpd = ThreadingHTTPServer((self.host, self.port), self.make_handler())
        # port=0 asks the OS for a free ephemeral port; reflect what was bound
        self.port = self._httpd.server_address[1]

    def serve_forever(self):
        self._bind()
        print(f"flux-fp8-api-tpu serving on http://{self.host}:{self.port}")
        self._httpd.serve_forever()

    def start_background(self):
        self._bind()
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()


def serve(pipeline, host: str = "0.0.0.0", port: int = 8088):
    PipelineServer(pipeline, host, port).serve_forever()
