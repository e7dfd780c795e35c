"""Time travel, cold tier, vacuum, rebalance, delta compression, ONNX."""

import numpy as np
import pytest

from neurondb_tpu.service.data_management import (ColdTier, TimeTravelStore,
                                                  delta_compress,
                                                  delta_decompress,
                                                  rebalance_ivf, vacuum)
from neurondb_tpu.store import VectorStore


@pytest.fixture()
def store(rng):
    st = VectorStore(8)
    st.add(rng.standard_normal((40, 8)).astype(np.float32))
    return st


def test_time_travel(store, rng):
    tt = TimeTravelStore(store)
    snap = tt.snapshot("before")
    x_new = rng.standard_normal((5, 8)).astype(np.float32)
    new_ids = store.add(x_new)
    # current store sees new rows
    _, ids_now = store.search(x_new[0], k=1)
    assert ids_now[0] == new_ids[0]
    # snapshot does not
    _, ids_then = tt.search_as_of("before", x_new[0], k=1)
    assert ids_then[0, 0] != new_ids[0]
    assert tt.list_snapshots()[0]["n"] == 40
    tt.drop_snapshot("before")
    assert not tt.list_snapshots()


def test_cold_tier(store):
    ct = ColdTier("int8")
    vec3 = store.get([3])[0]
    moved = ct.demote(store, [3, 4])
    assert moved == 2 and ct.size == 2
    assert len(store) == 38
    restored = ct.restore(store, [3])
    assert restored == 1 and ct.size == 1
    got = store.get([3])[0]
    # int8 roundtrip keeps the vector close
    assert np.abs(np.asarray(got) - np.asarray(vec3)).max() < 0.05


def test_vacuum(store):
    ids = np.arange(10)
    store.delete(ids)
    rep = vacuum(store)
    assert rep["ran"] and rep["reclaimed_rows"] == 10
    rep2 = vacuum(store)
    assert not rep2["ran"]


def test_rebalance(rng):
    from neurondb_tpu.index import IVFFlatIndex
    x = rng.standard_normal((800, 8)).astype(np.float32)
    idx = IVFFlatIndex(x, nlists=8, seed=0)
    idx.add(rng.standard_normal((100, 8)).astype(np.float32))
    rep = rebalance_ivf(idx, imbalance_threshold=100.0)  # spill forces run
    assert rep["ran"]
    assert not idx._spill
    d, ids = idx.search(x[5], k=1, nprobe=8)
    assert ids[0] == 5


def test_delta_compression(rng):
    base = rng.standard_normal((20, 8)).astype(np.float32)
    new = base.copy()
    new[3, 2] += 1.0
    blob = delta_compress(base, new)
    rec = delta_decompress(base, blob)
    np.testing.assert_array_equal(rec, new)
    # sparse deltas compress far below raw size
    assert len(blob) < base.nbytes / 2


def test_onnx_gateway_absent():
    from neurondb_tpu.service import onnx_runtime as ox
    if ox.HAVE_ORT:
        pytest.skip("onnxruntime present")
    with pytest.raises(RuntimeError, match="onnxruntime"):
        ox.onnx_predict("model.onnx", {})
    assert ox._cache.stats()["sessions"] == 0


def test_npz_encoder_roundtrip(tmp_path, rng):
    from neurondb_tpu.ml.transformer import (TextEmbedder,
                                             init_encoder_params)
    import jax, numpy as np
    p = init_encoder_params(jax.random.PRNGKey(0), hidden=64, layers=1,
                            heads=2, ff=128)
    emb = TextEmbedder(p, use_flash=False)
    v1 = emb(["roundtrip test"])
    # export flat npz and reload through the gateway loader
    flat = {}
    for k, v in p.items():
        if k == "layers":
            for i, lyr in enumerate(v):
                for kk, vv in lyr.items():
                    if isinstance(vv, dict):
                        for k3, v3 in vv.items():
                            flat[f"layers.{i}.{kk}.{k3}"] = np.asarray(v3)
                    else:
                        flat[f"layers.{i}.{kk}"] = np.asarray(vv)
        elif isinstance(v, dict):
            for kk, vv in v.items():
                flat[f"{k}.{kk}"] = np.asarray(vv)
        else:
            flat[k] = np.asarray(v)
    path = str(tmp_path / "enc.npz")
    np.savez(path, **flat)
    from neurondb_tpu.service.onnx_runtime import load_npz_encoder
    emb2 = load_npz_encoder(path)
    emb2.use_flash = False
    v2 = emb2(["roundtrip test"])
    np.testing.assert_allclose(v1, v2, rtol=1e-4, atol=1e-5)
