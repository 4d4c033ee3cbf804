"""Real-weights parity gate: reference scoring pipeline vs ours, one command.

THE gate to run the moment trained DeepImpact-family weights (e.g. a local
download of ``soyuj/deeper-impact``) and NanoBEIR data are on disk:

    python scripts/parity_gate.py --weights /path/to/hf_checkpoint_dir \
        --data_dir /path/to/nano_beir_dirs [--datasets scifact nfcorpus] \
        [--tol 0.005] [--reference_model shim|import]

Both sides load the SAME HF-format checkpoint (config.json + state dict
with the reference's ``impact_score_encoder.0`` head keys,
original.py:44-47) and the SAME local BEIR-format datasets
(corpus.jsonl/queries.jsonl/qrels.tsv per dataset dir), then:

- the REFERENCE side runs the actual reference ``SparseSearch``
  (/root/reference/src/deep_impact/evaluation/nano_beir_evaluator.py:70-137,
  loaded unmodified) over a torch model;
- OUR side runs ``evaluation.NanoBEIREvaluator`` -> ``SparseSearch`` on the
  JAX model (models/hf_import bridge).

nDCG@10 per dataset comes from the same trec metric implementation
(evaluation/trec_metrics.py — the reference's beir ``EvaluateRetrieval``
needs the beir package, absent here; using one metric impl on both sides
makes the delta purely a scoring-pipeline comparison).  Exit 0 iff
max |delta| <= --tol.

The torch model handed to the reference SparseSearch:

- ``--reference_model import``: the reference's own model class
  (``src.deep_impact.models.original.DeepImpact``).  Needs the reference's
  import-time deps (HF-cached ``vinai/phobert-base-v2``, py_vncorenlp,
  underthesea) — available on a networked box, not here.
- ``--reference_model shim`` (default): an independent torch
  reimplementation in this file — HF trunk via transformers + the
  checkpoint's head, per-document python loop, word_ids-based
  term -> first-token mapping, whitespace/punctuation query processing
  (the upstream semantics original.py mirrors for BERT-style weights).

Mechanism validation (no network needed): ``--selftest`` builds a tiny
random HF-format checkpoint + two tiny BEIR-format datasets in a temp dir,
runs the full gate on them, and asserts zero delta.  Wired into CI as
tests/test_parity_gate.py.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import string
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REFERENCE = Path("/root/reference")
_PUNCT = set(string.punctuation)


# ---------------------------------------------------------------- weights --


def load_state_dict(weights_dir: Path):
    """Raw checkpoint tensors (head keys included — AutoModel would drop
    them) from safetensors or pytorch_model.bin."""
    import torch

    st = weights_dir / "model.safetensors"
    if st.exists():
        from safetensors.torch import load_file

        return load_file(st)
    bin_path = weights_dir / "pytorch_model.bin"
    if not bin_path.exists():
        raise FileNotFoundError(f"no model.safetensors / pytorch_model.bin in {weights_dir}")
    return torch.load(bin_path, map_location="cpu", weights_only=True)


def encoder_config_from_hf(weights_dir: Path):
    from improving_learned_index_tpu.core.config import EncoderConfig

    hc = json.loads((weights_dir / "config.json").read_text())
    model_type = hc.get("model_type", "bert")
    pad = hc.get("pad_token_id") or 0
    return EncoderConfig(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        intermediate_size=hc["intermediate_size"],
        max_position_embeddings=hc["max_position_embeddings"],
        type_vocab_size=hc.get("type_vocab_size", 1),
        layer_norm_eps=hc.get("layer_norm_eps", 1e-12),
        pad_token_id=pad,
        position_offset=(pad + 1)
        if model_type in ("roberta", "xlm-roberta", "phobert")
        else 0,
        dtype="float32",  # parity gate: no bf16 noise in the comparison
    )


# ---------------------------------------------------- reference SparseSearch


def load_reference_sparse_search():
    """The reference's SparseSearch class, loaded unmodified from the
    checkout.  Only ``beir`` (used by the surrounding evaluator class, not
    by SparseSearch) is stubbed."""
    if not REFERENCE.exists():
        raise FileNotFoundError("reference checkout not mounted at /root/reference")
    if "beir" not in sys.modules:
        beir = types.ModuleType("beir")
        retrieval = types.ModuleType("beir.retrieval")
        evaluation = types.ModuleType("beir.retrieval.evaluation")
        evaluation.EvaluateRetrieval = type("EvaluateRetrieval", (), {})
        sys.modules["beir"] = beir
        sys.modules["beir.retrieval"] = retrieval
        sys.modules["beir.retrieval.evaluation"] = evaluation
    spec = importlib.util.spec_from_file_location(
        "ref_nano_beir_evaluator",
        REFERENCE / "src/deep_impact/evaluation/nano_beir_evaluator.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod.SparseSearch


# ------------------------------------------------------------- torch models


class TorchShimModel:
    """Independent torch scorer with the reference model surface
    (get_impact_scores_batch + process_query, original.py:96-254): HF trunk
    from the checkpoint dir, Linear+ReLU head from the state dict,
    word_ids-based term -> first-token map, whitespace/punctuation query
    terms.  Deliberately NOT a wrapper over this repo's JAX stack."""

    def __init__(self, weights_dir: Path, max_length: int = 256):
        import torch
        from transformers import AutoConfig, AutoModel, AutoTokenizer

        self.torch = torch
        cfg = AutoConfig.from_pretrained(weights_dir)
        self.trunk = AutoModel.from_config(cfg)
        sd = load_state_dict(weights_dir)
        prefix = ""
        for cand in ("bert.", "roberta.", "model."):
            if any(k.startswith(cand) for k in sd):
                prefix = cand
                break
        trunk_sd = {
            k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)
        } if prefix else {
            k: v for k, v in sd.items() if not k.startswith("impact_score_encoder")
        }
        missing, unexpected = self.trunk.load_state_dict(trunk_sd, strict=False)
        missing = [m for m in missing if "position_ids" not in m and "pooler" not in m]
        if missing:
            raise ValueError(f"trunk keys missing from checkpoint: {missing[:5]}")
        self.head = torch.nn.Linear(cfg.hidden_size, 1)
        wkey = "impact_score_encoder.0.weight"
        if wkey in sd:
            with torch.no_grad():
                self.head.weight.copy_(sd[wkey])
                self.head.bias.copy_(sd["impact_score_encoder.0.bias"])
        else:  # fresh trunk: mirror hf_deep_impact_to_flax's seeded init
            rng = np.random.default_rng(0)
            limit = float(np.sqrt(6.0 / (cfg.hidden_size + 1)))
            with torch.no_grad():
                self.head.weight.copy_(torch.tensor(
                    rng.uniform(-limit, limit, (cfg.hidden_size, 1)).T,
                    dtype=torch.float32,
                ))
                self.head.bias.zero_()
        self.trunk.eval()
        self.head.eval()
        self.tokenizer = AutoTokenizer.from_pretrained(weights_dir)
        self.max_length = max_length

    @staticmethod
    def _terms(text: str):
        return [w for w in text.lower().split() if w and w not in _PUNCT]

    def process_query(self, query: str):
        return set(self._terms(query))

    def _doc_term_map(self, document: str):
        """{term: first-token index} over the truncated encoding (the
        reference keeps a term's FIRST occurrence, original.py:232-252)."""
        words = self._terms(document)
        enc = self.tokenizer(
            " ".join(words),
            truncation=True,
            max_length=self.max_length,
            return_tensors=None,
        )
        word_ids = enc.word_ids()
        first_token = {}
        for tok_idx, wid in enumerate(word_ids):
            if wid is not None and wid not in first_token:
                first_token[wid] = tok_idx
        term_map = {}
        for wid, tok_idx in first_token.items():
            term = words[wid] if wid < len(words) else None
            if term and term not in term_map:
                term_map[term] = tok_idx
        return enc, term_map

    def get_impact_scores_batch(self, texts):
        torch = self.torch
        out = []
        for text in texts:  # per-doc loop: the reference's own batch shape
            enc, term_map = self._doc_term_map(text)
            ids = torch.tensor([enc["input_ids"]], dtype=torch.long)
            mask = torch.tensor([enc["attention_mask"]], dtype=torch.long)
            with torch.no_grad():
                hidden = self.trunk(ids, attention_mask=mask).last_hidden_state
                scores = torch.relu(self.head(hidden))[0, :, 0]
            out.append(
                [(t, float(scores[i])) for t, i in term_map.items()]
            )
        return out


def load_reference_model(weights_dir: Path, mode: str):
    if mode == "shim":
        return TorchShimModel(weights_dir)
    sys.path.insert(0, str(REFERENCE))
    from src.deep_impact.models.original import DeepImpact as RefDeepImpact

    return RefDeepImpact.load(str(weights_dir))


# ------------------------------------------------------------------- gate --


def run_gate(weights_dir: Path, data_dir: Path, datasets=None,
             batch_size: int = 16, tol: float = 0.005,
             reference_model: str = "shim", max_length: int = 256):
    from improving_learned_index_tpu.evaluation.nano_beir import (
        NanoBEIREvaluator,
        load_local_beir_dir,
    )
    from improving_learned_index_tpu.evaluation.trec_metrics import (
        evaluate as trec_evaluate,
    )
    from improving_learned_index_tpu.models import DeepImpact
    from improving_learned_index_tpu.models.hf_import import hf_deep_impact_to_flax
    from improving_learned_index_tpu.text.hf_adapter import load_hf_tokenizer

    weights_dir, data_dir = Path(weights_dir), Path(data_dir)
    # OUR side
    config = encoder_config_from_hf(weights_dir)
    tokenizer = load_hf_tokenizer(weights_dir, max_length)
    model = DeepImpact(config, tokenizer)
    model.params = hf_deep_impact_to_flax(load_state_dict(weights_dir), config)
    ours = NanoBEIREvaluator(
        batch_size=batch_size, local_data_dir=data_dir, datasets=datasets
    )
    our_metrics = ours.evaluate_all(model)

    # REFERENCE side: actual SparseSearch over the torch model
    RefSparseSearch = load_reference_sparse_search()
    ref_model = load_reference_model(weights_dir, reference_model)
    deltas = {}
    rows = []
    for name in ours.datasets:
        ds = load_local_beir_dir(data_dir / name)
        searcher = RefSparseSearch(ref_model, batch_size=batch_size)
        results = searcher.search(ds.queries, ds.corpus, k=1000)
        ref_ndcg = trec_evaluate(ds.relevant_docs, results, (10,))[0]["NDCG@10"]
        our_ndcg = our_metrics[name][0]["NDCG@10"]
        deltas[name] = our_ndcg - ref_ndcg
        rows.append((name, ref_ndcg, our_ndcg, deltas[name]))

    print(f"{'dataset':<16} {'ref nDCG@10':>12} {'ours nDCG@10':>13} {'delta':>9}")
    for name, r, o, d in rows:
        print(f"{name:<16} {r:>12.5f} {o:>13.5f} {d:>+9.5f}")
    worst = max(abs(d) for d in deltas.values())
    verdict = "PASS" if worst <= tol else "FAIL"
    print(f"max |delta| = {worst:.5f} (tol {tol}) -> {verdict}")
    return worst, deltas, rows


# --------------------------------------------------------------- selftest --


def build_selftest_fixture(root: Path, vocab_words=None, n_docs: int = 24,
                           seed: int = 0):
    """Tiny random HF-format checkpoint + two BEIR-format datasets."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    rng = np.random.default_rng(seed)
    words = vocab_words or [f"word{i:02d}" for i in range(40)]
    ckpt = root / "checkpoint"
    ckpt.mkdir(parents=True, exist_ok=True)
    vocab_file = ckpt / "vocab.txt"
    vocab_file.write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words) + "\n"
    )
    tok = BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)
    tok.save_pretrained(ckpt)
    cfg = BertConfig(
        vocab_size=tok.vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(seed)
    trunk = BertModel(cfg)
    sd = {f"bert.{k}": v for k, v in trunk.state_dict().items()}
    head = torch.nn.Linear(cfg.hidden_size, 1)
    torch.nn.init.normal_(head.weight, std=0.3)
    torch.nn.init.constant_(head.bias, 0.1)  # plenty of positive impacts
    sd["impact_score_encoder.0.weight"] = head.weight.detach()
    sd["impact_score_encoder.0.bias"] = head.bias.detach()
    torch.save(sd, ckpt / "pytorch_model.bin")
    cfg.save_pretrained(ckpt)

    data = root / "nano_beir"
    for d_i, ds_name in enumerate(("alpha", "beta")):
        d = data / ds_name
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "corpus.jsonl", "w") as f:
            for i in range(n_docs):
                text = " ".join(
                    rng.choice(words, size=6, replace=False).tolist()
                )
                f.write(json.dumps(
                    {"_id": f"d{i}", "title": "", "text": text}) + "\n")
        with open(d / "queries.jsonl", "w") as f, open(d / "qrels.tsv", "w") as q:
            q.write("query-id\tcorpus-id\tscore\n")
            for i in range(8):
                f.write(json.dumps(
                    {"_id": f"q{i}",
                     "text": " ".join(rng.choice(words, size=3, replace=False))}
                ) + "\n")
                q.write(f"q{i}\td{rng.integers(0, n_docs)}\t1\n")
    return ckpt, data


def train_selftest_checkpoint(ckpt: Path, data: Path, steps: int = 12):
    """Train the fixture checkpoint with THIS repo's own loop and export it
    back to HF format in place.

    Random weights exercise the gate mechanism but not the score
    distributions trained weights produce (near-zero ReLU knees, saturated
    impacts); this closes that gap offline: load the random fixture through
    the HF bridge, train pairwise-CE on triples derived from the fixture
    datasets to a measurably lower loss, and overwrite pytorch_model.bin
    via ``flax_deep_impact_to_hf`` — the export round-trip the real-weights
    gate will take when trained reference checkpoints exist."""
    import json as _json
    import tempfile

    import torch

    from improving_learned_index_tpu.core.config import TrainConfig
    from improving_learned_index_tpu.models import DeepImpact
    from improving_learned_index_tpu.models.hf_import import (
        flax_deep_impact_to_hf,
        hf_deep_impact_to_flax,
    )
    from improving_learned_index_tpu.text.hf_adapter import load_hf_tokenizer
    from improving_learned_index_tpu.train import COLLATES, Trainer

    config = encoder_config_from_hf(ckpt)
    tokenizer = load_hf_tokenizer(ckpt, 64)
    model = DeepImpact(config, tokenizer)
    model.params = hf_deep_impact_to_flax(load_state_dict(ckpt), config)

    # triples from the fixture datasets: (query, its relevant doc, another)
    triples = []
    for ds in sorted(p for p in data.iterdir() if p.is_dir()):
        docs = {
            r["_id"]: r["text"]
            for r in map(_json.loads, (ds / "corpus.jsonl").read_text().splitlines())
        }
        queries = {
            r["_id"]: r["text"]
            for r in map(_json.loads, (ds / "queries.jsonl").read_text().splitlines())
        }
        doc_ids = sorted(docs)
        for i, line in enumerate((ds / "qrels.tsv").read_text().splitlines()[1:]):
            qid, did, _ = line.split("\t")
            neg = docs[doc_ids[(doc_ids.index(did) + 1) % len(doc_ids)]]
            triples.append((queries[qid], docs[did], neg))

    cfg = TrainConfig(
        batch_size=4, lr=5e-3, save_every=10**9, eval_every=10**9,
        max_length=64, loss="pairwise_ce",
    )
    trainer = Trainer(model, cfg, Path(tempfile.mkdtemp(prefix="pg_train_")))
    collate = COLLATES["pairwise_ce"]
    batches = [
        collate(triples[i : i + 4], tokenizer, 64)
        for i in range(0, len(triples) - 3, 4)
    ]
    first = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    trainer.train(batches, total_steps=steps)
    last = float(trainer._grad_step(trainer.params, trainer._put_batch(batches[0]))[0][0])
    assert np.isfinite(first) and np.isfinite(last) and last < first, (
        f"fixture training did not learn: loss {first} -> {last}"
    )
    sd = flax_deep_impact_to_hf(trainer.params, config)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, ckpt / "pytorch_model.bin")
    print(f"trained fixture checkpoint: pairwise-CE loss {first:.4f} -> {last:.4f}")


def selftest(tol: float = 1e-6, trained: bool = False) -> int:
    import tempfile

    root = Path(tempfile.mkdtemp(prefix="parity_gate_"))
    ckpt, data = build_selftest_fixture(root)
    if trained:
        # trained impact distributions (ReLU knees, score>0 filtering under
        # learned weights) through BOTH stacks, not just random init
        train_selftest_checkpoint(ckpt, data)
    worst, _, _ = run_gate(ckpt, data, tol=tol, max_length=64)
    assert worst <= tol, f"selftest delta {worst} > {tol}"
    kind = "trained" if trained else "random"
    print(f"selftest OK: identical {kind} weights -> identical nDCG@10 "
          "through both pipelines")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", type=Path, help="HF-format checkpoint dir")
    ap.add_argument("--data_dir", type=Path,
                    help="dir of BEIR-format dataset dirs (corpus.jsonl/...)")
    ap.add_argument("--datasets", nargs="+", default=None)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--tol", type=float, default=0.005)
    ap.add_argument("--max_length", type=int, default=256)
    ap.add_argument("--reference_model", choices=["shim", "import"],
                    default="shim")
    ap.add_argument("--selftest", nargs="?", const="random",
                    choices=["random", "trained"], default=None,
                    help="offline mechanism validation on a generated "
                    "checkpoint (zero-delta assertion): 'random' weights, "
                    "or 'trained' — train the fixture with this repo's own "
                    "loop, export via flax_deep_impact_to_hf, and gate the "
                    "trained impact distributions through both stacks")
    args = ap.parse_args(argv)
    if args.selftest:
        return selftest(trained=args.selftest == "trained")
    if not args.weights or not args.data_dir:
        ap.error("--weights and --data_dir required (or --selftest)")
    worst, _, _ = run_gate(
        args.weights, args.data_dir, datasets=args.datasets,
        batch_size=args.batch_size, tol=args.tol,
        reference_model=args.reference_model, max_length=args.max_length,
    )
    return 0 if worst <= args.tol else 1


if __name__ == "__main__":
    raise SystemExit(main())
