"""Cross-implementation TRAINING parity: run the ACTUAL reference Trainer
(src/deep_impact/training/trainer.py) on CPU against our jitted train step,
on identical weights and batches, and assert loss, gradient, and post-update
parameter parity (VERDICT round-2 ask #1a).

What runs unmodified from the reference source: Trainer.__init__ bookkeeping,
Trainer.train()'s full hot loop (trainer.py:83-150), get_input_tensors /
get_output_scores / evaluate_loss (trainer.py:152-167: mask-multiply, token
sum, (B, n) reshape, CrossEntropyLoss vs zero labels), grad-accum divide,
clip-norm 2.0, torch AdamW step.

What is stubbed — CUDA/device plumbing only, never math: the DDP wrap
becomes a passthrough module (world size 1: DDP's only job is the gradient
all-reduce, a no-op), ``.to(rank)`` moves resolve to CPU, wandb and the
NanoBEIR evaluator module are import stubs (the test never enables either).
On a CPU-only torch build GradScaler('cuda')/autocast('cuda') disable
themselves, so both stacks step in fp32.

The weight bridge is models/hf_import.hf_deep_impact_to_flax — the same
converter used for real checkpoints; gradients ride the same converter
(it is a pure re-layout, so it maps d/dW exactly).
"""

import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

from improving_learned_index_tpu.core.config import EncoderConfig, TrainConfig
from improving_learned_index_tpu.models.deep_impact import DeepImpact
from improving_learned_index_tpu.models.hf_import import hf_deep_impact_to_flax
from improving_learned_index_tpu.train.trainer import Trainer as OurTrainer

pytestmark = pytest.mark.refparity

REFERENCE = Path("/root/reference")

B_GROUPS = 2  # query groups per batch
L = 16  # sequence length
VOCAB = 128
N_BATCHES = 4
LR = 1e-3


@pytest.fixture(scope="module")
def ref_trainer_mod(tmp_path_factory):
    """Import the reference trainer module with import-time stubs for the
    pieces that cannot exist offline/on CPU (wandb, the beir-backed
    evaluator module), plus a gloo world-size-1 process group."""
    if not REFERENCE.exists():
        pytest.skip("reference checkout not mounted")
    sys.path.insert(0, str(REFERENCE))
    stubbed = []
    try:
        import src.utils.defaults as ref_defaults

        ref_defaults.LOG_DIR = tmp_path_factory.mktemp("ref_logs")

        if "wandb" not in sys.modules:
            import importlib.machinery

            wandb_stub = types.ModuleType("wandb")
            wandb_stub.init = lambda **kw: None
            wandb_stub.log = lambda *a, **kw: None
            # a real-looking spec so importlib.util.find_spec("wandb")
            # callers (e.g. accelerate) don't choke on the stub
            wandb_stub.__spec__ = importlib.machinery.ModuleSpec(
                "wandb", loader=None
            )
            sys.modules["wandb"] = wandb_stub
            stubbed.append("wandb")

        # evaluation.nano_beir_evaluator imports beir + the HF-downloading
        # model stack; the trainer only needs the BaseEvaluator symbol.
        for pkg in ("src.deep_impact", "src.deep_impact.evaluation"):
            if pkg not in sys.modules:
                m = types.ModuleType(pkg)
                m.__path__ = [str(REFERENCE / pkg.replace(".", "/"))]
                sys.modules[pkg] = m
                stubbed.append(pkg)
        ev_name = "src.deep_impact.evaluation.nano_beir_evaluator"
        if ev_name not in sys.modules:
            ev = types.ModuleType(ev_name)

            class BaseEvaluator:  # matches the reference ABC surface
                def evaluate_all(self, model):
                    raise NotImplementedError

            ev.BaseEvaluator = BaseEvaluator
            sys.modules[ev_name] = ev
            stubbed.append(ev_name)

        import importlib

        mod = importlib.import_module("src.deep_impact.training.trainer")

        # DDP passthrough: world size 1, the wrap's only job (gradient
        # all-reduce) is a no-op; parameters() must expose the same set.
        class _NoDDP(torch.nn.Module):
            def __init__(self, module, **kw):
                super().__init__()
                self.module = module

            def forward(self, *a, **kw):
                return self.module(*a, **kw)

        orig_ddp = mod.DDP
        mod.DDP = _NoDDP

        import torch.distributed as dist

        if not dist.is_initialized():
            pg_file = tmp_path_factory.mktemp("pg") / "store"
            dist.init_process_group(
                "gloo", init_method=f"file://{pg_file}", rank=0, world_size=1
            )

        yield mod

        mod.DDP = orig_ddp
        if dist.is_initialized():
            dist.destroy_process_group()
    finally:
        sys.path.remove(str(REFERENCE))
        for name in stubbed:
            sys.modules.pop(name, None)


class _TorchDeepImpact(torch.nn.Module):
    """The reference DeepImpact architecture built locally: BERT trunk +
    Linear+ReLU impact head (reference models/original.py:44-63), with the
    module names (`bert`, `impact_score_encoder`) the checkpoint converter
    expects.  ``.to(rank)`` resolves to CPU (device plumbing only)."""

    def __init__(self, cfg: EncoderConfig, seed: int = 0):
        super().__init__()
        from transformers import BertConfig, BertModel

        torch.manual_seed(seed)
        hf_cfg = BertConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
            hidden_dropout_prob=0.0,  # dropout off: .train() mode must not
            attention_probs_dropout_prob=0.0,  # diverge from our deterministic fwd
            pad_token_id=cfg.pad_token_id,
        )
        self.bert = BertModel(hf_cfg, add_pooling_layer=False)
        self.impact_score_encoder = torch.nn.Sequential(
            torch.nn.Linear(cfg.hidden_size, 1), torch.nn.ReLU()
        )

    def forward(self, input_ids, attention_mask, token_type_ids):
        out = self.bert(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
        )
        return self.impact_score_encoder(out.last_hidden_state)

    def to(self, *args, **kwargs):
        if args and isinstance(args[0], int):
            return self
        return super().to(*args, **kwargs)


def _tiny_cfg() -> EncoderConfig:
    import dataclasses

    return dataclasses.replace(EncoderConfig.tiny(vocab_size=VOCAB), dtype="float32")


def _make_batches(rng: np.random.Generator):
    """N_BATCHES batches of 2*B_GROUPS docs: torch form (encoded_list +
    stacked bool masks, the collate_fn layout, train.py:18-33) and our
    numpy-dict form, built from the same arrays."""
    torch_batches, our_batches = [], []
    for _ in range(N_BATCHES):
        n_docs = 2 * B_GROUPS
        ids = rng.integers(4, VOCAB, (n_docs, L)).astype(np.int64)
        mask = np.ones((n_docs, L), dtype=np.int64)
        for d in range(n_docs):  # ragged padding tails
            pad_from = int(rng.integers(L - 4, L + 1))
            mask[d, pad_from:] = 0
            ids[d, pad_from:] = 0
        qmask = np.zeros((n_docs, L), dtype=bool)
        for d in range(n_docs):  # a few query-term first-token positions
            hits = rng.choice(np.arange(1, L - 4), size=3, replace=False)
            qmask[d, hits] = True
        type_ids = np.zeros((n_docs, L), dtype=np.int64)

        encoded_list = [
            SimpleNamespace(
                ids=ids[d].tolist(),
                attention_mask=mask[d].tolist(),
                type_ids=type_ids[d].tolist(),
            )
            for d in range(n_docs)
        ]
        torch_batches.append(
            {
                "encoded_list": encoded_list,
                "masks": torch.stack(
                    [torch.from_numpy(qmask[d]) for d in range(n_docs)], dim=0
                ).unsqueeze(-1),
            }
        )
        our_batches.append(
            {
                "input_ids": ids.astype(np.int32),
                "attention_mask": mask.astype(np.int32),
                "type_ids": type_ids.astype(np.int32),
                "masks": qmask.astype(np.float32),
            }
        )
    return torch_batches, our_batches


def _cpu_tensor_to(monkeypatch):
    """Route ``tensor.to(rank)`` to CPU: get_input_tensors and the
    masks/labels moves (trainer.py:152-156,161,165) call .to(0)."""
    orig_to = torch.Tensor.to

    def to_cpu(self, *args, **kwargs):
        if args and isinstance(args[0], int):
            return self
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", to_cpu)


def _flax_tree_from_torch(model: _TorchDeepImpact, cfg, grads: bool = False):
    src = (
        {name: p.grad for name, p in model.named_parameters()}
        if grads
        else model.state_dict()
    )
    return hf_deep_impact_to_flax(src, cfg)


def _tree_allclose(ours, theirs, atol, rtol, what):
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_t = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(theirs)
    )
    assert len(flat_o) == len(flat_t)
    for key, val in flat_o:
        np.testing.assert_allclose(
            np.asarray(val),
            np.asarray(flat_t[jax.tree_util.keystr(key)]),
            atol=atol,
            rtol=rtol,
            err_msg=f"{what}: {jax.tree_util.keystr(key)}",
        )


def test_gradient_parity_single_batch(ref_trainer_mod, monkeypatch, tmp_path):
    """One batch through the reference Trainer's get_output_scores /
    evaluate_loss / backward vs our jitted value_and_grad: loss and every
    parameter gradient agree (trainer.py:100-110,158-167)."""
    _cpu_tensor_to(monkeypatch)
    cfg = _tiny_cfg()
    tmodel = _TorchDeepImpact(cfg, seed=0)
    params = hf_deep_impact_to_flax(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(0)
    torch_batches, our_batches = _make_batches(rng)

    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    trainer = ref_trainer_mod.Trainer(
        model=tmodel,
        optimizer=opt,
        train_data=torch_batches,
        checkpoint_dir=tmp_path / "ref_ckpt",
        batch_size=B_GROUPS,
        save_every=10**6,
        save_best=False,  # the reference CLI default (train.py:252 store_true)
        use_wandb=False,
    )
    outputs = trainer.get_output_scores(torch_batches[0])
    assert outputs.shape == (B_GROUPS, 2)
    ref_loss = trainer.evaluate_loss(outputs, torch_batches[0])
    ref_loss.backward()
    ref_grads = _flax_tree_from_torch(tmodel, cfg, grads=True)

    ours = DeepImpact(cfg, tokenizer=None, params=params)
    tc = TrainConfig(
        batch_size=B_GROUPS, lr=LR, weight_decay=0.01, save_every=10**6,
        eval_every=10**9, loss="pairwise_ce",
    )
    our_trainer = OurTrainer(ours, tc, tmp_path / "our_ckpt")
    (our_loss, _), our_grads = our_trainer._grad_step(
        our_trainer.params, our_trainer._put_batch(our_batches[0])
    )

    np.testing.assert_allclose(
        float(our_loss), float(ref_loss.detach()), atol=2e-5, rtol=2e-5
    )
    _tree_allclose(our_grads, ref_grads, atol=1e-6, rtol=2e-3, what="grad")


def test_train_loop_parity(ref_trainer_mod, monkeypatch, tmp_path):
    """The reference Trainer.train() hot loop (clip 2.0 + AdamW steps across
    N_BATCHES batches) vs our Trainer.train on the same batches: per-batch
    loss trajectory matches and the final parameters agree."""
    _cpu_tensor_to(monkeypatch)
    cfg = _tiny_cfg()
    tmodel = _TorchDeepImpact(cfg, seed=0)
    params = hf_deep_impact_to_flax(tmodel.state_dict(), cfg)

    rng = np.random.default_rng(1)
    torch_batches, our_batches = _make_batches(rng)

    ref_losses = []
    orig_eval_loss = ref_trainer_mod.Trainer.evaluate_loss

    def recording_eval_loss(self, outputs, batch):
        loss = orig_eval_loss(self, outputs, batch)
        ref_losses.append(float(loss.detach()))
        return loss

    monkeypatch.setattr(ref_trainer_mod.Trainer, "evaluate_loss", recording_eval_loss)

    opt = torch.optim.AdamW(tmodel.parameters(), lr=LR)
    trainer = ref_trainer_mod.Trainer(
        model=tmodel,
        optimizer=opt,
        train_data=torch_batches,
        checkpoint_dir=tmp_path / "ref_ckpt",
        batch_size=B_GROUPS,
        save_every=10**6,
        save_best=False,  # the reference CLI default (train.py:252 store_true)
        use_wandb=False,
    )
    trainer.train()
    assert len(ref_losses) == N_BATCHES
    ref_final = _flax_tree_from_torch(tmodel, cfg)

    ours = DeepImpact(cfg, tokenizer=None, params=params)
    tc = TrainConfig(
        batch_size=B_GROUPS, lr=LR, weight_decay=0.01, save_every=10**6,
        eval_every=10**9, loss="pairwise_ce",
    )
    our_trainer = OurTrainer(ours, tc, tmp_path / "our_ckpt")
    our_losses = []
    orig_grad_step = our_trainer._grad_step

    def recording_grad_step(params, batch):
        (loss, gn), grads = orig_grad_step(params, batch)
        our_losses.append(float(loss))
        return (loss, gn), grads

    our_trainer._grad_step = recording_grad_step
    our_trainer.train(our_batches)
    assert len(our_losses) == N_BATCHES

    # batch 0 is pre-update (tight); later batches compound optimizer drift
    np.testing.assert_allclose(our_losses[0], ref_losses[0], atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(our_losses, ref_losses, atol=2e-3, rtol=2e-3)
    _tree_allclose(
        our_trainer.params, ref_final, atol=5e-4, rtol=5e-3, what="final params"
    )
