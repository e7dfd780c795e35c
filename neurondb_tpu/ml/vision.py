"""ViT image encoder — bit-compatible with HF ViTModel weights.

Reference: the GPU multimodal runtime (NeuronDB/src/gpu/cuda/
gpu_hf_kernels.cu hf_image_embed / hf_multimodal_embed vtable entries,
include/neurondb_gpu_backend.h:28-352) serving `embed_image` /
`embed_multimodal` SQL (src/ml/embeddings.c:813,927). Round 1 embedded a
byte histogram; this module runs a real vision transformer: patchify ->
linear projection -> CLS + position embeddings -> pre-LN transformer ->
final LayerNorm (+ tanh pooler), matching HF `ViTModel` exactly so
google/vit-base-class weights exported by scripts/export_hf.py produce
real image embeddings. Parity is asserted against transformers' ViTModel
in tests/test_vision.py (random-init — no downloads needed).

Patchify-as-GEMM: HF's Conv2d(3, H, kernel=P, stride=P) patch projection
is equivalent to reshaping the image into [N_patches, P*P*3] rows and
one [P*P*3, H] matmul — the MXU-native formulation (no conv needed).
"""

from __future__ import annotations

import functools
import io
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def init_vit_params(key, *, hidden=256, layers=4, heads=4, ff=1024,
                    patch=16, image_size=64, channels=3) -> Dict:
    n_patches = (image_size // patch) ** 2
    ks = jax.random.split(key, 5 + layers)
    std = 0.02
    rnd = lambda k, shape: jax.random.normal(k, shape) * std  # noqa: E731
    p = {
        "cls": rnd(ks[0], (1, 1, hidden)),
        "pos_emb": rnd(ks[1], (1, n_patches + 1, hidden)),
        "patch_w": rnd(ks[2], (patch * patch * channels, hidden)),
        "patch_b": jnp.zeros(hidden),
        "final_ln": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
        "pooler": {"w": rnd(ks[3], (hidden, hidden)),
                   "b": jnp.zeros(hidden)},
        "layers": [],
        "patch": patch, "image_size": image_size, "channels": channels,
    }
    for i in range(layers):
        k = jax.random.split(ks[5 + i], 6)
        p["layers"].append({
            "ln1": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "wq": rnd(k[0], (hidden, hidden)), "bq": jnp.zeros(hidden),
            "wk": rnd(k[1], (hidden, hidden)), "bk": jnp.zeros(hidden),
            "wv": rnd(k[2], (hidden, hidden)), "bv": jnp.zeros(hidden),
            "wo": rnd(k[3], (hidden, hidden)), "bo": jnp.zeros(hidden),
            "ln2": {"g": jnp.ones(hidden), "b": jnp.zeros(hidden)},
            "w1": rnd(k[4], (hidden, ff)), "b1": jnp.zeros(ff),
            "w2": rnd(k[5], (ff, hidden)), "b2": jnp.zeros(hidden),
        })
    return p


def _ln(x, g, b, eps=1e-12):            # HF ViTLayerNorm eps
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, N_patches, patch*patch*C] rows ordered
    row-major over the patch grid, pixel-row-major within a patch and
    channel-last within a pixel — matching Conv2d(stride=patch) applied
    to [B, C, H, W] followed by flatten(2).transpose(1, 2)."""
    B, H, W, C = images.shape
    gh, gw = H // patch, W // patch
    x = images.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)           # [B, gh, gw, p, p, C]
    return x.reshape(B, gh * gw, patch * patch * C)


_META_KEYS = ("patch", "image_size", "channels")


def vit_encode(params: Dict, images: jax.Array, *, heads: int = 4) -> Dict:
    """images [B, H, W, C] float (already normalized) -> {'hidden'
    [B, N+1, D], 'pooled' (CLS tanh pooler), 'cls' (final-LN CLS),
    'mean_pooled'}."""
    weights = {k: v for k, v in params.items() if k not in _META_KEYS}
    return _vit_encode_jit(weights, images, heads=heads,
                           patch=int(params["patch"]))


@functools.partial(jax.jit, static_argnames=("heads", "patch"))
def _vit_encode_jit(params: Dict, images: jax.Array, *, heads: int,
                    patch: int) -> Dict:
    pt = patchify(images, patch)
    x = pt @ params["patch_w"] + params["patch_b"]       # [B, N, D]
    B, N, Dh_ = x.shape
    cls = jnp.broadcast_to(params["cls"], (B, 1, Dh_))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_emb"][:, :N + 1]
    dh = Dh_ // heads
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    S = N + 1
    for lyr in params["layers"]:
        h = _ln(x, lyr["ln1"]["g"], lyr["ln1"]["b"])     # pre-LN
        q = h @ lyr["wq"] + lyr["bq"]
        k = h @ lyr["wk"] + lyr["bk"]
        v = h @ lyr["wv"] + lyr["bv"]
        qh = q.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        kh = k.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        vh = v.reshape(B, S, heads, dh).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, vh,
                       preferred_element_type=jnp.float32)
        att = o.transpose(0, 2, 1, 3).reshape(B, S, Dh_)
        x = x + att @ lyr["wo"] + lyr["bo"]
        h2 = _ln(x, lyr["ln2"]["g"], lyr["ln2"]["b"])
        ffn = jax.nn.gelu(h2 @ lyr["w1"] + lyr["b1"],
                          approximate=False) @ lyr["w2"] + lyr["b2"]
        x = x + ffn
    x = _ln(x, params["final_ln"]["g"], params["final_ln"]["b"])
    pooled = jnp.tanh(x[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])
    mean_pooled = jnp.mean(x[:, 1:], axis=1)
    return {"hidden": x, "pooled": pooled, "cls": x[:, 0],
            "mean_pooled": mean_pooled}


# --------------------------------------------------------------------------
# HF state-dict mapping (ViTModel; scripts/export_hf.py --vision writes)
# --------------------------------------------------------------------------

_VIT_LAYER_MAP = {
    "layernorm_before.weight": ("ln1.g", False),
    "layernorm_before.bias": ("ln1.b", False),
    "attention.attention.query.weight": ("wq", True),
    "attention.attention.query.bias": ("bq", False),
    "attention.attention.key.weight": ("wk", True),
    "attention.attention.key.bias": ("bk", False),
    "attention.attention.value.weight": ("wv", True),
    "attention.attention.value.bias": ("bv", False),
    "attention.output.dense.weight": ("wo", True),
    "attention.output.dense.bias": ("bo", False),
    "layernorm_after.weight": ("ln2.g", False),
    "layernorm_after.bias": ("ln2.b", False),
    "intermediate.dense.weight": ("w1", True),
    "intermediate.dense.bias": ("b1", False),
    "output.dense.weight": ("w2", True),
    "output.dense.bias": ("b2", False),
}


def params_from_hf_vit_state_dict(state: Dict[str, np.ndarray]) -> Dict:
    """Map an HF ViTModel state dict. The Conv2d projection weight
    [H, C, P, P] flattens to our [P*P*C, H] patch GEMM: transpose to
    [P, P, C, H] (pixel-row, pixel-col, channel, out) to match the
    patchify() row layout."""
    flat: Dict[str, np.ndarray] = {}
    nlayers = 0
    for name, arr in state.items():
        if name.startswith("vit."):
            name = name[4:]
        a = np.asarray(arr)
        if name == "embeddings.cls_token":
            flat["cls"] = a
        elif name == "embeddings.position_embeddings":
            flat["pos_emb"] = a
        elif name == "embeddings.patch_embeddings.projection.weight":
            h, c, p, _ = a.shape
            flat["patch_w"] = a.transpose(2, 3, 1, 0).reshape(p * p * c, h)
            flat["_patch"] = np.asarray(p)
            flat["_channels"] = np.asarray(c)
        elif name == "embeddings.patch_embeddings.projection.bias":
            flat["patch_b"] = a
        elif name == "layernorm.weight":
            flat["final_ln.g"] = a
        elif name == "layernorm.bias":
            flat["final_ln.b"] = a
        elif name == "pooler.dense.weight":
            flat["pooler.w"] = a.T
        elif name == "pooler.dense.bias":
            flat["pooler.b"] = a
        elif name.startswith("encoder.layer."):
            _, _, i, rest = name.split(".", 3)
            if rest in _VIT_LAYER_MAP:
                tgt, transpose = _VIT_LAYER_MAP[rest]
                flat[f"layers.{i}.{tgt}"] = a.T if transpose else a
                nlayers = max(nlayers, int(i) + 1)
    hidden = flat["cls"].shape[-1]
    patch = int(flat["_patch"])
    n_patches = flat["pos_emb"].shape[1] - 1
    image_size = int(round(n_patches ** 0.5)) * patch
    p: Dict = {
        "cls": jnp.asarray(flat["cls"]),
        "pos_emb": jnp.asarray(flat["pos_emb"]),
        "patch_w": jnp.asarray(flat["patch_w"]),
        "patch_b": jnp.asarray(flat["patch_b"]),
        "final_ln": {"g": jnp.asarray(flat["final_ln.g"]),
                     "b": jnp.asarray(flat["final_ln.b"])},
        "pooler": {"w": jnp.asarray(flat.get(
            "pooler.w", np.eye(hidden, dtype=np.float32))),
            "b": jnp.asarray(flat.get(
                "pooler.b", np.zeros(hidden, np.float32)))},
        "layers": [],
        "patch": patch, "image_size": image_size,
        "channels": int(flat.get("_channels", 3)),
    }
    for i in range(nlayers):
        lyr = {}
        for tgt in ("wq bq wk bk wv bv wo bo w1 b1 w2 b2".split()):
            lyr[tgt] = jnp.asarray(flat[f"layers.{i}.{tgt}"])
        for ln in ("ln1", "ln2"):
            lyr[ln] = {"g": jnp.asarray(flat[f"layers.{i}.{ln}.g"]),
                       "b": jnp.asarray(flat[f"layers.{i}.{ln}.b"])}
        p["layers"].append(lyr)
    return p


def load_vit_npz(path: str) -> Dict:
    data = np.load(path)
    return params_from_hf_vit_state_dict({k: data[k] for k in data.files})


# --------------------------------------------------------------------------
# image preprocessing + the embedder facade
# --------------------------------------------------------------------------

def preprocess_image(image_bytes: bytes, size: int,
                     mean: float = 0.5, std: float = 0.5) -> np.ndarray:
    """Decode (PIL when importable, raw square RGB bytes otherwise),
    resize to [size, size], scale to [0,1], normalize — HF
    ViTImageProcessor defaults (mean=std=0.5)."""
    try:
        from PIL import Image
        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        img = img.resize((size, size))
        arr = np.asarray(img, np.float32) / 255.0
    except Exception:
        flat = np.frombuffer(image_bytes, np.uint8)
        side = int((len(flat) // 3) ** 0.5)
        if side == 0:
            arr = np.zeros((size, size, 3), np.float32)
        else:
            arr = flat[: side * side * 3].reshape(
                side, side, 3).astype(np.float32) / 255.0
            # nearest-neighbor resize without PIL
            ix = (np.arange(size) * side // size)
            arr = arr[ix][:, ix]
    return (arr - mean) / std


class VisionEncoder:
    """Image -> embedding. With real ViT weights (``load_vit_npz``) this
    is genuine semantic vision embedding; with none supplied it runs a
    small deterministic random-init ViT (structure-preserving but not
    semantic — tests treat it as such)."""

    def __init__(self, params: Optional[Dict] = None, *, heads: int = 12,
                 seed: int = 0):
        if params is None:
            params = init_vit_params(jax.random.PRNGKey(seed))
            heads = 4
        self.params = params
        self.heads = heads

    @classmethod
    def from_npz(cls, path: str, *, heads: Optional[int] = None
                 ) -> "VisionEncoder":
        p = load_vit_npz(path)
        h = heads or max(1, p["cls"].shape[-1] // 64)
        return cls(p, heads=h)

    @property
    def image_size(self) -> int:
        return int(self.params["image_size"])

    def embed_images(self, batches: np.ndarray) -> np.ndarray:
        """[B, H, W, C] normalized float images -> [B, D] embeddings
        (final-LN CLS, the ViT feature convention)."""
        out = vit_encode(self.params, jnp.asarray(batches, jnp.float32),
                         heads=self.heads)
        return np.asarray(out["cls"])

    def embed_bytes(self, image_bytes: bytes) -> np.ndarray:
        arr = preprocess_image(image_bytes, self.image_size)
        return self.embed_images(arr[None])[0]
