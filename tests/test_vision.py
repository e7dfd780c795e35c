"""ViT encoder: HF ViTModel parity (random init — no downloads) and the
multimodal embedding service wiring."""

import numpy as np
import pytest

import jax


def _hf_tiny_vit():
    transformers = pytest.importorskip("transformers")
    import torch
    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=8)
    torch.manual_seed(0)
    return transformers.ViTModel(cfg), cfg


def test_vit_parity_with_hf():
    from neurondb_tpu.ml.vision import (params_from_hf_vit_state_dict,
                                        vit_encode)
    import torch
    model, cfg = _hf_tiny_vit()
    model.eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_vit_state_dict(state)
    assert params["patch"] == 8 and params["image_size"] == 32
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    out = vit_encode(params, img, heads=4)
    hid = np.asarray(out["hidden"])
    np.testing.assert_allclose(hid, ref.last_hidden_state.numpy(),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["pooled"]),
                               ref.pooler_output.numpy(),
                               rtol=1e-3, atol=2e-3)


def test_patchify_matches_conv_layout():
    """patchify rows must equal Conv2d(stride=patch) + flatten.transpose."""
    import torch
    from neurondb_tpu.ml.vision import patchify
    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 8, 8)).astype(np.float32)
    conv = torch.nn.functional.conv2d(
        torch.from_numpy(img.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        stride=8).flatten(2).transpose(1, 2).numpy()       # [1, 4, 5]
    pt = np.asarray(patchify(img, 8))                       # [1, 4, 192]
    wt = w.transpose(2, 3, 1, 0).reshape(192, 5)
    np.testing.assert_allclose(pt @ wt, conv, rtol=1e-4, atol=1e-4)


def test_vision_encoder_deterministic_and_shaped():
    from neurondb_tpu.ml.vision import VisionEncoder
    enc = VisionEncoder(seed=3)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 64, 64, 3)).astype(np.float32)
    e1 = enc.embed_images(img)
    e2 = enc.embed_images(img)
    assert e1.shape == (3, 256)
    np.testing.assert_array_equal(e1, e2)
    assert not np.allclose(e1[0], e1[1])


def test_preprocess_and_bytes_path():
    from neurondb_tpu.ml.vision import VisionEncoder, preprocess_image
    # synthesize a PNG via PIL if present; else raw bytes fallback
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
    try:
        import io
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(raw).save(buf, format="PNG")
        blob = buf.getvalue()
    except ImportError:
        blob = raw.tobytes()
    arr = preprocess_image(blob, 64)
    assert arr.shape == (64, 64, 3)
    assert abs(float(arr.mean())) < 1.2          # normalized range
    enc = VisionEncoder(seed=0)
    v = enc.embed_bytes(blob)
    assert v.shape == (256,) and np.isfinite(v).all()


def test_embedding_service_vision_wiring():
    from neurondb_tpu.ml.vision import VisionEncoder
    from neurondb_tpu.service.embeddings import EmbeddingService
    svc = EmbeddingService()
    svc.set_vision_encoder(VisionEncoder(seed=1))
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8).tobytes()
    v = svc.embed_image(raw)
    cfg = svc.get_model("default")
    assert v.shape == (cfg.dim,)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-4
    m = svc.embed_multimodal("a caption", raw)
    assert m.shape == (cfg.dim,) and np.isfinite(m).all()
