"""Flash-attention kernel vs the full-attention oracle (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from neurondb_tpu.ops.pallas.flash_attention import (attention_reference,
                                                     flash_attention)


@pytest.fixture(scope="module")
def qkv(rng_mod):
    rng = rng_mod
    B, H, S, Dh = 2, 2, 256, 64
    q = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    return q, k, v


def test_flash_matches_reference(qkv):
    q, k, v = qkv
    ref = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True,
                                     bf16=False))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flash_bf16_accuracy(qkv):
    """bf16 MXU path (round-2 perf pass): softmax-weighted averages of
    O(1) values keep ~2 decimal digits under bf16 matmuls."""
    q, k, v = qkv
    ref = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True,
                                     bf16=True))
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-2)


def test_flash_with_mask(qkv, rng):
    q, k, v = qkv
    B, H, S, Dh = q.shape
    mask = np.ones((B, S), np.int32)
    mask[0, 100:] = 0           # ragged sequence lengths
    mask[1, 50:] = 0
    ref = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v),
                                         mask=jnp.asarray(mask) > 0))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), jnp.asarray(mask),
                                     interpret=True, bf16=False))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flash_unaligned_seq(rng):
    # S not a tile multiple: pad/trim path
    B, H, S, Dh = 1, 1, 200, 64
    q = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    ref = np.asarray(attention_reference(jnp.asarray(q), jnp.asarray(k),
                                         jnp.asarray(v)))
    out = np.asarray(flash_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), interpret=True,
                                     bf16=False))
    assert out.shape == (B, H, S, Dh)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_encoder_flash_vs_reference_path(rng):
    """The transformer encoder must produce identical embeddings whether
    attention runs the flash kernel (interpret) or the oracle."""
    import jax
    from neurondb_tpu.ml import transformer as T
    p = T.init_encoder_params(jax.random.PRNGKey(0), hidden=128, layers=1,
                              heads=2, ff=256)
    ids = np.stack([T.HashTokenizer().encode("flash attention parity", 128)])
    out_ref = np.asarray(T.encode(p, jnp.asarray(ids), heads=2,
                                  use_flash=False)["pooled"])
    # interpret-mode flash inside encode: monkeypatch dispatch
    import neurondb_tpu.ops.pallas.flash_attention as FA
    orig = FA.flash_attention
    try:
        FA.flash_attention = lambda q, k, v, mask=None: orig(
            q, k, v, mask, interpret=True)
        out_flash = np.asarray(T.encode(p, jnp.asarray(ids), heads=2,
                                        use_flash=True)["pooled"])
    finally:
        FA.flash_attention = orig
    np.testing.assert_allclose(out_flash, out_ref, rtol=5e-3, atol=5e-3)


def test_flash_large_tile_path(rng):
    """S > 512 selects the large measured tiles (512/2048 at Dh=64);
    multi-kv-tile online-softmax accumulation must still match the
    oracle, including a ragged mask crossing kv-tile boundaries."""
    B, H, S, Dh = 1, 1, 2560, 64
    q = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[:, 1900:] = 0
    ref = np.asarray(attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask)))
    out = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(mask),
        interpret=True, bf16=False))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_flash_seq_between_tile_sizes(rng):
    """Regression: S=640 with Dh=64 previously picked (qt=512, kt=640);
    Sp=640 // 512 floored to ONE q tile and rows 512..639 of the output
    were never written. Tiles must be power-of-two clamped so the
    padded S divides both."""
    B, H, S, Dh = 1, 1, 640, 64
    q = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    k = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    v = rng.standard_normal((B, H, S, Dh)).astype(np.float32)
    ref = np.asarray(attention_reference(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    out = np.asarray(flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        interpret=True, bf16=False))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)
