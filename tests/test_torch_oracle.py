"""Cross-framework full-encoder oracle: an independent PyTorch rebuild of
the FastConformer pipeline from the SAME flat param dict, mirroring the
reference's tier-3 parity strategy (compare_encoder.py rebuilds the model
in PyTorch from the same safetensors and diffs stage by stage).

This is the strongest parity evidence available without real weights: two
implementations in two frameworks, one weight schema, equal outputs. The
torch implementation lives in parakeet_tpu.tools.torch_ref (shared with
scripts/pytorch_benchmark.py); it uses torch.nn layers directly, NOT a
port of our JAX code, so a shared mistake is unlikely.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from parakeet_tpu import config as C  # noqa: E402
from parakeet_tpu import params as P  # noqa: E402
from parakeet_tpu.models import encoder as E  # noqa: E402
from parakeet_tpu.models.ctc import ctc_log_probs  # noqa: E402
from parakeet_tpu.params import Params  # noqa: E402
from parakeet_tpu.tools.torch_ref import (  # noqa: E402
    t,
    torch_encoder,
    torch_subsampling,
)

torch.manual_seed(0)


def tiny_cfg():
    return C.EncoderConfig(
        mel_bins=80, subsampling_channels=8, hidden_size=32, num_layers=2,
        num_heads=4, ffn_intermediate=64, conv_kernel_size=9,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    spec = P.encoder_spec(cfg, "encoder_")
    spec.update(P.ctc_spec(11, cfg.hidden_size))
    params = P.init_params(spec, seed=42)
    rng = np.random.RandomState(1)
    feats = rng.randn(2, 64, 80).astype(np.float32) * 0.5
    return cfg, params, feats


def test_subsampling_matches_torch(setup):
    cfg, params, feats = setup
    ours = np.asarray(E.conv_subsampling(Params(params).sub("encoder_").sub("subsampling_"),
                                         jnp.asarray(feats)))
    with torch.no_grad():
        ref = torch_subsampling(params, torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_full_encoder_matches_torch(setup):
    """Two independent implementations (JAX feature-minor vs torch NCHW/NCT),
    one weight schema → equal encoder outputs."""
    cfg, params, feats = setup
    ours = np.asarray(E.fastconformer_encode(Params(params).sub("encoder_"), cfg,
                                             jnp.asarray(feats)))
    with torch.no_grad():
        ref = torch_encoder(params, cfg, torch.from_numpy(feats)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_ctc_log_probs_match_torch(setup):
    cfg, params, feats = setup
    enc = E.fastconformer_encode(Params(params).sub("encoder_"), cfg, jnp.asarray(feats))
    ours = np.asarray(ctc_log_probs(Params(params).sub("ctc_decoder_"), enc))
    with torch.no_grad():
        enc_t = torch.from_numpy(np.asarray(enc))
        h = TF.conv1d(enc_t.transpose(1, 2), t(params, "ctc_decoder_.proj_.weight"),
                      t(params, "ctc_decoder_.proj_.bias")).transpose(1, 2)
        ref = TF.log_softmax(h, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
