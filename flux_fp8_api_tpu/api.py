"""FastAPI server (reference ``api.py:1-123``): POST /generate → streaming JPEG,
POST /lora → load/unload, plus TPU-stack extras (/health, /metrics).

Same request schemas and error envelopes as the reference. A pipeline-level lock
serializes /generate against /lora — the reference relies on implicitly-synchronous
handlers for this (SURVEY.md §5 race note); we make the single-flight model explicit.
"""

from __future__ import annotations

import platform
import threading
import time
from typing import Optional

import numpy as np

try:
    from fastapi import FastAPI, HTTPException
    from fastapi.responses import JSONResponse, StreamingResponse
except ImportError as e:  # bare TPU-VM image: use flux_fp8_api_tpu.server instead
    raise ImportError(
        "fastapi is not installed; the stdlib server (flux_fp8_api_tpu.server) "
        "provides the same endpoints without extra wheels"
    ) from e
from pydantic import BaseModel, Field

app = FastAPI()

if platform.system() == "Windows":  # reference api.py:12-15
    MAX_RAND = 2**16 - 1
else:
    MAX_RAND = 2**32 - 1

_PIPELINE_LOCK = threading.Lock()
_METRICS = {"requests": 0, "images": 0, "total_seconds": 0.0, "last_seconds": None}
_LAST_TIMINGS: dict = {}  # last COMPLETED request's pipeline.timings (lock-snapshotted)


class GenerateArgs(BaseModel):
    """reference api.py:38-48."""

    prompt: str
    width: Optional[int] = Field(default=720)
    height: Optional[int] = Field(default=1024)
    num_steps: Optional[int] = Field(default=24)
    guidance: Optional[float] = Field(default=3.5)
    # ge=0 (not the reference's gt=0, api.py:46): np.random.randint's low bound is
    # inclusive, so the reference's own default factory can produce seed 0 and then
    # reject it — a bug we don't reproduce.
    seed: Optional[int] = Field(
        default_factory=lambda: np.random.randint(0, MAX_RAND), ge=0, lt=MAX_RAND
    )
    strength: Optional[float] = 1.0
    init_image: Optional[str] = None
    # opt-in step cache, e.g. {"mode": "dynamic", "threshold": 0.25} — parsed by
    # sampling.CacheConfig; a TPU-stack extra over the reference api.py schema
    cache: Optional[dict] = None


class LoraArgs(BaseModel):
    """reference api.py:27-31."""

    scale: Optional[float] = 1.0
    path: Optional[str] = None
    name: Optional[str] = None
    action: Optional[str] = "load"  # "load" | "unload"


class LoraLoadResponse(BaseModel):
    status: str
    message: str


@app.post("/generate")
def generate(args: GenerateArgs):
    """Generate an image from the prompt (reference api.py:54-86)."""
    # An explicit "seed": null bypasses the default_factory (it only fires when
    # the field is OMITTED): fill it here so X-Seed always reports the seed the
    # pipeline actually used, mirroring server.py's handle_generate.
    if args.seed is None:
        args.seed = int(np.random.randint(0, MAX_RAND))
    try:
        # validate the cache spec up front: a typo'd option is a client error
        from .sampling import CacheConfig

        cache = CacheConfig.parse(args.cache)
    except (TypeError, ValueError) as e:
        raise HTTPException(status_code=400, detail=str(e))
    t0 = time.perf_counter()
    with _PIPELINE_LOCK:
        # silent=True selects the fused-scan serving denoise (pipeline.py: the
        # interactive per-step path exists for tqdm progress, not servers) and
        # holding the lock for the metrics update keeps the counters race-free
        # under FastAPI's threadpool
        result = app.state.model.generate(
            silent=True, **{**args.model_dump(), "cache": cache}
        )
        dt = time.perf_counter() - t0
        _METRICS["requests"] += 1
        _METRICS["images"] += 1
        _METRICS["total_seconds"] += dt
        _METRICS["last_seconds"] = dt
        # snapshot the per-phase timings while still holding the lock: a /metrics
        # read during the NEXT in-flight request must not see a half-updated mix
        # of this request's and that one's phases
        global _LAST_TIMINGS
        _LAST_TIMINGS = dict(getattr(app.state.model, "timings", {}))
    # X-Seed: the seed actually used (defaulted server-side when absent) — the
    # reference Gradio UI's used-seed readback (main_gr.py:28-42), here as a
    # header so the JPEG body stays a pure stream
    return StreamingResponse(
        result, media_type="image/jpeg", headers={"x-seed": str(args.seed)}
    )


@app.post("/lora", response_model=LoraLoadResponse)
def lora_action(args: LoraArgs):
    """Load or unload a LoRA (reference api.py:89-122): same 400/500 envelopes."""
    try:
        if args.action == "load":
            if not args.path:
                raise HTTPException(status_code=400, detail="Lora path is required")
            with _PIPELINE_LOCK:
                app.state.model.load_lora(
                    lora_path=args.path, scale=args.scale, name=args.name
                )
            return JSONResponse(
                content={
                    "status": "success",
                    "message": f"LoRA {args.path} loaded successfully",
                },
                status_code=200,
            )
        elif args.action == "unload":
            ident = args.name or args.path
            if not ident:
                raise HTTPException(
                    status_code=400, detail="Lora path or name is required"
                )
            with _PIPELINE_LOCK:
                app.state.model.unload_lora(ident)
            return JSONResponse(
                content={
                    "status": "success",
                    "message": f"LoRA {ident} unloaded successfully",
                },
                status_code=200,
            )
        raise HTTPException(status_code=400, detail=f"Invalid action {args.action}")
    except HTTPException:
        raise
    except Exception as e:  # reference api.py:105-121
        return JSONResponse(
            content={"status": "error", "message": str(e)}, status_code=500
        )


@app.get("/")
def index():
    """Browser UI (webui.py — the wheel-free Gradio twin, same page the stdlib
    server serves at /)."""
    from fastapi.responses import Response

    from .webui import render_index

    return Response(
        content=render_index(getattr(app.state, "model", None)),
        media_type="text/html; charset=utf-8",
    )


@app.get("/health")
def health() -> dict:
    """TPU extra: liveness + model identity."""
    model = getattr(app.state, "model", None)
    return {
        "status": "ok" if model is not None else "loading",
        "model": getattr(model, "name", None),
        "loras": [l.name for l in getattr(model, "loras", [])],
    }


@app.get("/metrics")
def metrics() -> dict:
    """TPU extra: request counters, latency, and the last request's per-phase
    timings — incl. ``denoise_it_per_s``, the reference's headline tqdm rate
    (flux_pipeline.py:628-630; SURVEY.md §5 tracing)."""
    out = dict(_METRICS)
    if _METRICS["requests"]:
        out["avg_seconds"] = _METRICS["total_seconds"] / _METRICS["requests"]
    # _LAST_TIMINGS is rebound atomically under the generate lock — never a torn
    # mix of an in-flight request's phases with the previous one's
    out.update(_LAST_TIMINGS)
    return out
