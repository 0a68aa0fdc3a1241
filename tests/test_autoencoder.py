"""VAE tests (tiny config): shapes, determinism, gaussian sampling, scale/shift."""

import jax
import jax.numpy as jnp
import numpy as np

from flux_fp8_api_tpu.models.autoencoder import (
    ae_decode,
    ae_encode,
    diagonal_gaussian_sample,
    init_autoencoder_params,
)

from .helpers import TINY_AE_PARAMS


class TestAutoencoder:
    def setup_method(self):
        self.cfg = TINY_AE_PARAMS
        self.params = init_autoencoder_params(jax.random.PRNGKey(0), self.cfg)

    def test_encode_shape(self):
        # ch_mult [1,1,2,2] → three downsamples → /8 spatial, z_channels latent
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z = ae_encode(self.params, self.cfg, x)
        assert z.shape == (1, 4, 4, self.cfg.z_channels)

    def test_decode_shape(self):
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, self.cfg.z_channels))
        img = ae_decode(self.params, self.cfg, z)
        assert img.shape == (1, 32, 32, 3)

    def test_encode_deterministic_without_key(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z1 = ae_encode(self.params, self.cfg, x)
        z2 = ae_encode(self.params, self.cfg, x)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    def test_encode_sampling_uses_key(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        z1 = ae_encode(self.params, self.cfg, x, key=jax.random.PRNGKey(1))
        z2 = ae_encode(self.params, self.cfg, x, key=jax.random.PRNGKey(2))
        assert float(jnp.max(jnp.abs(z1 - z2))) > 0

    def test_scale_shift_inverse(self):
        # encode applies scale*(z-shift); decode un-applies before the decoder.
        # Verify on the DiagonalGaussian mean path with the raw formulas.
        z = jnp.ones((1, 4, 4, self.cfg.z_channels)) * 0.7
        scaled = self.cfg.scale_factor * (z - self.cfg.shift_factor)
        unscaled = scaled / self.cfg.scale_factor + self.cfg.shift_factor
        np.testing.assert_allclose(np.asarray(unscaled), 0.7, rtol=1e-6)

    def test_diagonal_gaussian_mean_path(self):
        z = jnp.concatenate(
            [jnp.full((1, 2, 2, 4), 1.5), jnp.zeros((1, 2, 2, 4))], axis=-1
        )
        out = diagonal_gaussian_sample(z, key=None)
        np.testing.assert_allclose(np.asarray(out), 1.5)

    def test_jit_decode(self):
        dec = jax.jit(lambda p, z: ae_decode(p, self.cfg, z))
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, self.cfg.z_channels))
        img = dec(self.params, z)
        assert img.shape == (1, 64, 64, 3)

    def test_bf16_decode(self):
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), self.params)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, self.cfg.z_channels), jnp.bfloat16)
        img = ae_decode(params, self.cfg, z)
        assert img.dtype == jnp.bfloat16

class TestQuantizedAE:
    """Weight-only fp8 AE — the reference's quanto-qfloat8 swap (util.py:288-291)."""

    def setup_method(self):
        self.cfg = TINY_AE_PARAMS
        self.params = init_autoencoder_params(jax.random.PRNGKey(0), self.cfg)

    def test_decode_close_to_float(self):
        from flux_fp8_api_tpu.models.autoencoder import quantize_ae_params

        qparams = quantize_ae_params(self.params)
        # every conv kernel is e4m3 with a per-out-channel scale
        k = qparams["decoder"]["conv_in"]["kernel"]
        assert k.dtype == jnp.float8_e4m3fn
        assert qparams["decoder"]["conv_in"]["kscale_inv"].shape == (k.shape[-1],)
        z = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, self.cfg.z_channels))
        ref = np.asarray(ae_decode(self.params, self.cfg, z), dtype=np.float64)
        out = np.asarray(ae_decode(qparams, self.cfg, z), dtype=np.float64)
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.15, rel

    def test_loader_honors_ae_quantization_dtype(self):
        from flux_fp8_api_tpu.utils.config import QuantizationDtype
        from flux_fp8_api_tpu.utils.loader import load_autoencoder

        from .helpers import tiny_spec

        spec = tiny_spec(ae_quantization_dtype=QuantizationDtype.qfloat8)
        params = load_autoencoder(spec)
        assert params["decoder"]["conv_in"]["kernel"].dtype == jnp.float8_e4m3fn
        spec_plain = tiny_spec()
        params_plain = load_autoencoder(spec_plain)
        assert params_plain["decoder"]["conv_in"]["kernel"].dtype != jnp.float8_e4m3fn
