#!/usr/bin/env python
"""Export an HF BERT-family checkpoint to the engine's weight format.

Counterpart of the reference's ONNX export tooling
(NeuronDB/src/onnx/hf_onex.py, simple_hf_export.py): run this where
egress (or a populated HF cache) exists, then point the engine at the
output directory:

    python scripts/export_hf.py sentence-transformers/all-MiniLM-L6-v2 \
        --out /path/to/weights_dir
    NEURONDB_TPU_WEIGHTS=/path/to/weights_dir python ...

Output:
    weights.npz   flat npz of the raw HF state dict (torch [out, in]
                  Linear layout; neurondb_tpu.ml.bert transposes on load)
    vocab.txt     WordPiece vocab (one token per line)
    config.json   heads / hidden / layers / max_len

The engine side (zero-egress safe) is ml/bert.load_bert_npz +
ml/tokenizer.WordPieceTokenizer.from_file.
"""

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="HF model id or local path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cross-encoder", action="store_true",
                    help="export a sequence-classification head too")
    ap.add_argument("--vision", action="store_true",
                    help="export a ViTModel (google/vit-base-class) for "
                         "ml.vision.VisionEncoder.from_npz")
    ap.add_argument("--gpt", action="store_true",
                    help="export a GPT2LMHeadModel (+ BPE vocab.json/"
                         "merges.txt) for ml.gpt.GPT2LM.from_dir; point "
                         "NEURONDB_TPU_GPT_WEIGHTS at the output dir")
    args = ap.parse_args()

    import numpy as np
    from transformers import AutoConfig, AutoModel, AutoTokenizer
    if args.cross_encoder:
        from transformers import AutoModelForSequenceClassification as M
    elif args.vision:
        from transformers import ViTModel as M
    elif args.gpt:
        from transformers import GPT2LMHeadModel as M
    else:
        M = AutoModel

    os.makedirs(args.out, exist_ok=True)
    model = M.from_pretrained(args.model)
    cfg = AutoConfig.from_pretrained(args.model)

    state = {k: v.detach().cpu().numpy()
             for k, v in model.state_dict().items()}
    np.savez_compressed(os.path.join(args.out, "weights.npz"), **state)

    if args.vision:
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump({"hidden": cfg.hidden_size,
                       "heads": cfg.num_attention_heads,
                       "layers": cfg.num_hidden_layers,
                       "patch": cfg.patch_size,
                       "image_size": cfg.image_size,
                       "model": args.model}, f, indent=2)
        print("exported vision", args.model, "->", args.out)
        return
    if args.gpt:
        tok = AutoTokenizer.from_pretrained(args.model, use_fast=False)
        vocab = tok.get_vocab()
        with open(os.path.join(args.out, "vocab.json"), "w",
                  encoding="utf-8") as f:
            json.dump(vocab, f, ensure_ascii=False)
        with open(os.path.join(args.out, "merges.txt"), "w",
                  encoding="utf-8") as f:
            f.write("#version: 0.2\n")
            for pair, _rank in sorted(tok.bpe_ranks.items(),
                                      key=lambda kv: kv[1]):
                f.write(f"{pair[0]} {pair[1]}\n")
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump({"hidden": cfg.n_embd, "heads": cfg.n_head,
                       "layers": cfg.n_layer,
                       "max_len": int(cfg.n_positions),
                       "model": args.model}, f, indent=2)
        print("exported gpt", args.model, "->", args.out)
        return
    tok = AutoTokenizer.from_pretrained(args.model)

    vocab = tok.get_vocab()
    inv = sorted(vocab, key=vocab.get)
    with open(os.path.join(args.out, "vocab.txt"), "w",
              encoding="utf-8") as f:
        f.write("\n".join(inv) + "\n")

    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump({
            "hidden": cfg.hidden_size,
            "heads": cfg.num_attention_heads,
            "layers": cfg.num_hidden_layers,
            "max_len": int(getattr(cfg, "max_position_embeddings", 512)),
            "lowercase": bool(getattr(tok, "do_lower_case", True)),
            "model": args.model,
        }, f, indent=2)
    print("exported", args.model, "->", args.out)


if __name__ == "__main__":
    main()
