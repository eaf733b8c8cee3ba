"""Safetensors IO + parameter schema tests."""

import numpy as np
import pytest

from parakeet_tpu import config as C
from parakeet_tpu.io.safetensors import load_safetensors, save_safetensors
from parakeet_tpu import params as P


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a.weight": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b.bias": np.ones(5, dtype=np.float32),
        "c": np.array([1, 2, 3], dtype=np.int64),
    }
    path = tmp_path / "t.safetensors"
    save_safetensors(tensors, path, metadata={"format": "pt"})
    loaded = load_safetensors(path)
    assert set(loaded) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(loaded[k], tensors[k])


def test_safetensors_bf16_roundtrip(tmp_path):
    import ml_dtypes

    x = np.arange(8, dtype=np.float32).astype(ml_dtypes.bfloat16)
    path = tmp_path / "bf16.safetensors"
    save_safetensors({"x": x}, path)
    loaded = load_safetensors(path)
    assert loaded["x"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(loaded["x"].astype(np.float32), x.astype(np.float32))


def test_110m_spec_keys():
    cfg = C.make_110m_config()
    spec = P.tdt_ctc_spec(cfg)
    # Converter schema spot checks (convert_nemo.py:98-238)
    assert "encoder_.subsampling_.conv1_.weight" in spec
    assert spec["encoder_.subsampling_.proj_.weight"][0] == (512, 256 * 10)
    assert "encoder_.layers_.16.attn_.mha_.q_proj.weight" in spec
    assert "encoder_.layers_.0.attn_.pos_bias_u_" in spec
    assert spec["encoder_.layers_.0.attn_.pos_bias_u_"][0] == (8, 64)
    assert spec["encoder_.layers_.0.conv_.depthwise_conv_.weight"][0] == (512, 1, 9)
    assert "encoder_.layers_.0.conv_.batch_norm_.running_mean" in spec
    assert spec["prediction_.embed_.weight"][0] == (1025, 640)
    assert spec["prediction_.lstm_.cells_.0.input_proj_.weight"][0] == (2560, 640)
    # hidden_proj_ is bias-free
    assert "prediction_.lstm_.cells_.0.hidden_proj_.bias" not in spec
    assert spec["tdt_joint_.label_proj_.weight"][0] == (1025, 640)
    assert spec["tdt_joint_.duration_proj_.weight"][0] == (5, 640)
    assert "tdt_joint_.pred_proj_.bias" not in spec
    assert spec["ctc_decoder_.proj_.weight"][0] == (1025, 512, 1)


def test_600m_spec_freq_dim():
    cfg = C.make_tdt_600m_config()
    spec = P.tdt_spec(cfg)
    # 128 mels → 16 after 3× stride-2
    assert spec["encoder_.subsampling_.proj_.weight"][0] == (1024, 256 * 16)
    assert "joint_.label_proj_.weight" in spec  # tdt-600m uses 'joint_' prefix


def test_rnnt_spec():
    spec = P.rnnt_spec(C.make_rnnt_600m_config())
    assert spec["joint_.out_proj_.weight"][0] == (1025, 640)
    assert "joint_.label_proj_.weight" not in spec


def test_sortformer_spec():
    cfg = C.make_sortformer_117m_config()
    spec = P.sortformer_spec(cfg)
    assert spec["nest_encoder_.subsampling_.proj_.weight"][0] == (512, 256 * 16)
    assert spec["projection_.weight"][0] == (192, 512)
    assert spec["transformer_.layers_.17.fc1_.weight"][0] == (768, 192)
    assert spec["output_proj_.weight"][0] == (4, 192)
    assert spec["hidden_to_spks_.weight"][0] == (4, 384)  # loaded, unused


def test_init_and_load_roundtrip(tmp_path):
    cfg = C.make_110m_config()
    spec = P.prediction_spec(cfg.prediction)
    params = P.init_params(spec, seed=1)
    assert set(params) == set(spec)
    # Save, reload over fresh init: must be identical where provided.
    save_safetensors({k: np.asarray(v) for k, v in params.items()}, tmp_path / "w.safetensors")
    loaded = P.load_params(spec, str(tmp_path / "w.safetensors"), seed=2)
    for k in spec:
        np.testing.assert_allclose(np.asarray(loaded[k]), np.asarray(params[k]))


def test_load_missing_keys_kept_random(tmp_path):
    cfg = C.make_110m_config()
    spec = P.prediction_spec(cfg.prediction)
    # Write only the embedding
    params = P.init_params(spec, seed=1)
    save_safetensors({"prediction_.embed_.weight": np.asarray(params["prediction_.embed_.weight"])},
                     tmp_path / "partial.safetensors")
    warnings = []
    loaded = P.load_params(spec, str(tmp_path / "partial.safetensors"), warn=warnings.append)
    assert warnings  # missing-key warning fired (convert_nemo.py:488-498 semantics)
    assert loaded["prediction_.embed_.weight"].shape == (1025, 640)
    with pytest.raises(KeyError):
        P.load_params(spec, str(tmp_path / "partial.safetensors"), strict=True)


def test_shape_mismatch_raises(tmp_path):
    spec = {"x.weight": ((2, 3), "w")}
    save_safetensors({"x.weight": np.zeros((3, 2), np.float32)}, tmp_path / "bad.safetensors")
    with pytest.raises(ValueError):
        P.load_params(spec, str(tmp_path / "bad.safetensors"))


def test_params_prefix_view():
    d = {"encoder_.layers_.0.fc1_.weight": 1, "encoder_.layers_.0.fc1_.bias": 2}
    root = P.Params(d)
    layer = root.sub("encoder_").sub("layers_").sub("0")
    assert layer.sub("fc1_")["weight"] == 1
    assert "bias" in layer.sub("fc1_")
    assert layer.get("nope") is None


def test_cast_params_keeps_norm_f32():
    import jax.numpy as jnp
    from parakeet_tpu import config as C

    cfg = C.make_110m_config()
    spec = P.encoder_spec(cfg.encoder, "encoder_")
    params = P.init_params(spec, seed=0)
    cast = P.cast_params(params, jnp.bfloat16)
    assert cast["encoder_.layers_.0.ffn1_.fc1_.weight"].dtype == jnp.bfloat16
    assert cast["encoder_.layers_.0.ffn1_.norm_.weight"].dtype == jnp.float32
    assert cast["encoder_.layers_.0.conv_.batch_norm_.running_var"].dtype == jnp.float32
    assert cast["encoder_.layers_.0.final_norm_.bias"].dtype == jnp.float32
