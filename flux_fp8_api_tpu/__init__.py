"""flux_fp8_api_tpu — a TPU-native (JAX/XLA/Pallas) FLUX.1 fp8 inference framework.

Brand-new implementation with the capabilities of the reference `aredden/flux-fp8-api`
(see SURVEY.md): FluxPipeline orchestration, true fp8-scaled matmul layers, tiered
quantization, LoRA hot-load, prompt emphasis, T5/CLIP conditioning, VAE, FastAPI/Gradio
front-ends — redesigned for TPU (params-as-pytree, jit/scan, Pallas kernels, mesh
sharding, host offload).
"""

__version__ = "0.1.0"

from .utils.config import (  # noqa: F401
    ModelSpec,
    ModelVersion,
    QuantizationDtype,
    load_config,
    load_config_from_path,
)


def __getattr__(name):
    # lazy: importing FluxPipeline pulls jax model code; keep bare `import
    # flux_fp8_api_tpu` light for config-only consumers
    if name == "FluxPipeline":
        from .pipeline import FluxPipeline

        return FluxPipeline
    if name == "flux_from_pretrained":
        from .utils.loader import flux_from_pretrained

        return flux_from_pretrained
    if name == "CacheConfig":
        from .sampling import CacheConfig

        return CacheConfig
    raise AttributeError(name)
