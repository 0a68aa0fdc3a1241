"""CLI server launcher (reference ``main.py:1-199``): same flags, uvicorn serve."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Launch Flux TPU API server")
    parser.add_argument("-c", "--config-path", type=str,
                        help="Path to a config JSON; if absent the model is built from the flags below")
    parser.add_argument("-p", "--port", type=int, default=8088, help="Port to run the server on")
    parser.add_argument("-H", "--host", type=str, default="0.0.0.0", help="Host to run the server on")
    parser.add_argument("-f", "--flow-model-path", type=str, help="Path to the flow model safetensors")
    parser.add_argument("-t", "--text-enc-path", type=str, help="Path to the T5 encoder directory")
    parser.add_argument("-a", "--autoencoder-path", type=str, help="Path to the autoencoder safetensors")
    parser.add_argument("-m", "--model-version", type=str,
                        choices=["flux-dev", "flux-schnell"], default="flux-dev")
    parser.add_argument("-F", "--flux-device", type=str, default="tpu:0",
                        help="Device for the flow model (cuda:N accepted, maps to tpu:N)")
    parser.add_argument("-T", "--text-enc-device", type=str, default="tpu:0")
    parser.add_argument("-A", "--autoencoder-device", type=str, default="tpu:0")
    parser.add_argument("-q", "--num-to-quant", type=int, default=20,
                        help="(deprecated, kept for reference-CLI parity)")
    parser.add_argument("-C", "--compile", action="store_true",
                        help="Warm up + AOT-compile the denoise step (the torch.compile analog)")
    parser.add_argument("-qT", "--quant-text-enc", type=str, default="qfloat8",
                        choices=["qint4", "qfloat8", "qint2", "qint8", "bf16"],
                        dest="quant_text_enc",
                        help="Quantization tier for the T5 text encoder")
    parser.add_argument("-qA", "--quant-ae", action="store_true", dest="quant_ae",
                        help="Quantize the autoencoder with weight-only fp8")
    # offload semantics match the reference exactly (reference main.py:97-120):
    # flow offload is opt-IN (-OF turns it on); ae/text-enc offload default ON and
    # -OA/-OT are the *disable* switches.
    parser.add_argument("-OF", "--offload-flow", action="store_true", default=False,
                        dest="offload_flow",
                        help="Offload the flow model to the host when not in use")
    parser.add_argument("-OA", "--no-offload-ae", action="store_false", default=True,
                        dest="offload_ae",
                        help="Disable offloading the autoencoder to the host when not in use")
    parser.add_argument("-OT", "--no-offload-text-enc", action="store_false", default=True,
                        dest="offload_text_enc",
                        help="Disable offloading the text encoder to the host when not in use")
    parser.add_argument("-PF", "--prequantized-flow", action="store_true",
                        help="Flow checkpoint already carries fp8 data + scales (skips calibration)")
    parser.add_argument("-nqfm", "--no-quantize-flow-modulation", dest="quantize_modulation",
                        action="store_false", default=True,
                        help="Keep modulation linears unquantized (~2GB more, better precision)")
    parser.add_argument("-qfl", "--quantize-flow-embedder-layers", action="store_true",
                        help="Also quantize img_in/txt_in/time_in/vector_in/guidance_in (~512MB less)")
    parser.add_argument("--compilation-cache-dir", type=str, default=None,
                        help="Persistent XLA compilation cache: server restarts skip "
                             "the 20-60s serving-bucket compiles")
    parser.add_argument("--save-prequantized", type=str, default=None, metavar="PATH",
                        help="Calibrate (if needed), save a prequantized flow "
                             "checkpoint (fp8 data + weight/input scales, ~50%% "
                             "smaller, skips warmup at reload) to PATH, then exit "
                             "instead of serving. The reference documents this as a "
                             "manual run-24-steps-then-save-state_dict procedure "
                             "(reference main.py:127-131); here it is one flag.")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Multi-chip serving mesh, e.g. 'dp=1,tp=4': shards the "
                             "flow over (data, tensor) parallel axes (TPU extension; "
                             "overrides the config file's mesh field)")
    return parser.parse_args(argv)


def parse_mesh(spec: str):
    """'dp=1,tp=4' → {"dp": 1, "tp": 4} (preserving axis order)."""
    mesh = {}
    for part in spec.split(","):
        axis, _, size = part.partition("=")
        if not axis or not size:
            raise SystemExit(f"--mesh {spec!r}: expected comma-separated axis=size pairs")
        try:
            mesh[axis.strip()] = int(size)
        except ValueError:
            raise SystemExit(f"--mesh {spec!r}: size for axis {axis!r} is not an integer")
    return mesh


def main(argv=None):
    args = parse_args(argv)

    # lazy imports so --help returns fast (reference main.py:154-156)
    from .pipeline import FluxPipeline
    from .utils.config import ModelVersion, load_config

    # the API server only ever calls generate(silent=True): skip the interactive
    # per-step precompile (a second whole-model compile per bucket) under -C
    overrides = {"precompile_interactive": False}
    if args.compilation_cache_dir:
        overrides["compilation_cache_dir"] = args.compilation_cache_dir
    if args.mesh:
        overrides["mesh"] = parse_mesh(args.mesh)
    if args.config_path:
        pipeline = FluxPipeline.load_pipeline_from_config_path(
            args.config_path, flow_model_path=args.flow_model_path, **overrides
        )
    else:
        config = load_config(
            ModelVersion(args.model_version),
            flux_path=args.flow_model_path,
            flux_device=args.flux_device,
            ae_path=args.autoencoder_path,
            ae_device=args.autoencoder_device,
            text_enc_path=args.text_enc_path,
            text_enc_device=args.text_enc_device,
            flow_dtype="bfloat16",
            text_enc_dtype="bfloat16",
            ae_dtype="bfloat16",
            num_to_quant=args.num_to_quant,
            compile_extras=args.compile,
            compile_blocks=args.compile,
            quant_text_enc=(None if args.quant_text_enc == "bf16" else args.quant_text_enc),
            quant_ae=args.quant_ae,
            offload_flow=args.offload_flow,
            offload_ae=args.offload_ae,
            offload_text_enc=args.offload_text_enc,
            prequantized_flow=args.prequantized_flow,
            quantize_modulation=args.quantize_modulation,
            quantize_flow_embedder_layers=args.quantize_flow_embedder_layers,
        )
        for k, v in overrides.items():
            setattr(config, k, v)
        pipeline = FluxPipeline.load_pipeline_from_config(config)

    if args.save_prequantized:
        from .utils.logging import logger

        if pipeline._needs_calibration:
            # compile() runs the reference's warmup recipe until the input scales
            # freeze (num_scale_trials forward passes), which save_prequantized
            # requires — scales ship in the checkpoint
            logger.info("calibrating input scales before prequantized export …")
            pipeline.compile()
        pipeline.save_prequantized(args.save_prequantized)
        logger.info(
            f"prequantized flow checkpoint written to {args.save_prequantized} — "
            "reload with prequantized_flow=true (-PF)"
        )
        return

    try:
        import uvicorn

        from .api import app

        app.state.model = pipeline
        uvicorn.run(app, host=args.host, port=args.port)
    except ImportError:
        # bare TPU-VM image without fastapi/uvicorn: stdlib server, same endpoints
        from .server import serve

        serve(pipeline, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
