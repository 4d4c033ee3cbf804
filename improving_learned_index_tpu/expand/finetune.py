"""doc2query fine-tuning: LoRA adapters on the Llama decoder.

Capability parity with the reference FineTuner
(src/llama2/finetune/finetune.py:41-216): (document, query) pairs become
``prompt(document) + query + eos`` sequences with **prompt tokens masked out
of the loss** (labels -100 semantics, finetune.py:145-155); only the LoRA
adapters (r=16, alpha=32 on the 7 projection matrices, finetune.py:100-121)
receive gradients — the frozen base stays in bf16 (the TPU counterpart of
the reference's NF4 4-bit base).  AdamW on adapters, jitted train step,
optional jax.profiler trace (the reference's torch.profiler option,
finetune.py:84-96).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import GenerationConfig
from ..core.logging import get_logger
from ..models.llama import LlamaConfig, LlamaModel
from .generate import PROMPT_EN
from .lora import LoraConfig, init_lora_params, lora_forward_params

logger = get_logger("finetune")

IGNORE_INDEX = -100


def build_example(
    tokenizer,
    document: str,
    query: str,
    prompt_template: str = PROMPT_EN,
    max_length: int = 2048,
    eos_token_id: int = 2,
    bos_token_id: int = 1,
) -> Tuple[List[int], List[int]]:
    """(input_ids, labels) with prompt positions labeled IGNORE_INDEX."""
    prompt_ids = tokenizer.encode(prompt_template.format(doc=document))
    query_ids = tokenizer.encode(query)
    # Strip the continuation's auto-added BOS (the prompt already carries
    # it).  Gate on the configured BOS id — a shared first token alone
    # could be a legitimate word both texts start with; Llama-3-style
    # tokenizers use a BOS other than 1, so the id is a parameter.
    if (query_ids and prompt_ids
            and query_ids[0] == prompt_ids[0] == bos_token_id):
        query_ids = query_ids[1:]
    ids = (prompt_ids + query_ids + [eos_token_id])[:max_length]
    labels = ([IGNORE_INDEX] * len(prompt_ids) + query_ids + [eos_token_id])[:max_length]
    return ids, labels


def collate_examples(
    examples: List[Tuple[List[int], List[int]]], pad_token_id: int = 0
) -> Dict[str, np.ndarray]:
    max_len = max(len(ids) for ids, _ in examples)
    n = len(examples)
    input_ids = np.full((n, max_len), pad_token_id, dtype=np.int32)
    labels = np.full((n, max_len), IGNORE_INDEX, dtype=np.int32)
    mask = np.zeros((n, max_len), dtype=np.int32)
    for i, (ids, labs) in enumerate(examples):
        input_ids[i, : len(ids)] = ids
        labels[i, : len(labs)] = labs
        mask[i, : len(ids)] = 1
    return {"input_ids": input_ids, "labels": labels, "attention_mask": mask}


def _layerwise_trunk(config, lora_config, lora, base_params, batch):
    """Hidden states after the final norm, with per-layer dequant+merge
    inside ``jax.checkpoint``.

    The merged-tree path (``lora_forward_params`` over the whole model)
    makes XLA hold the full dequantized+merged bf16 weights (13.4 GB at
    7B) NEXT TO the quantized base for the forward+backward — an OOM on a
    16 GB chip.  Here each layer's weights are dequantized and LoRA-merged
    INSIDE a checkpoint region, so the backward recomputes them and at any
    moment only ~one layer's full-precision weights are live.  Numerically
    identical to the merged path (same math, different schedule) —
    tests/test_finetune.py pins loss+grad parity.

    Returns ``(x, head_kernel)`` where ``head_kernel`` is the (merged)
    ``[hidden, vocab]`` output projection — the tied embedding transposed
    when ``config.tie_word_embeddings``.
    """
    from ..models.llama import LlamaLayer, RMSNorm
    from ..models.quantization import dequantize_params
    from .lora import merge_lora

    c = config
    dt = jnp.dtype(c.dtype)
    input_ids = batch["input_ids"]
    attention_mask = batch["attention_mask"]
    bsz, qlen = input_ids.shape
    base = jax.lax.stop_gradient(base_params)

    def deq_merge(subtree, lora_subtree):
        merged = dequantize_params(subtree, dtype=dt)
        if lora_subtree:
            merged = merge_lora(merged, lora_subtree, lora_config)
        return merged

    embed = deq_merge(base["embed_tokens"], lora.get("embed_tokens"))
    x = jnp.take(embed["embedding"], input_ids, axis=0).astype(dt)
    positions = jnp.broadcast_to(
        jnp.arange(qlen, dtype=jnp.int32)[None], (bsz, qlen)
    )
    causal = jnp.tril(jnp.ones((qlen, qlen), dtype=bool))
    mask = causal[None, None] & attention_mask[:, None, None, :].astype(bool)
    bias = jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min).astype(jnp.float32)

    layer_mod = LlamaLayer(c)
    seg_ids = attention_mask if c.use_flash_attention else None

    @jax.checkpoint
    def layer_step(x, layer_q, layer_lora):
        merged = deq_merge(layer_q, layer_lora)
        out, _ = layer_mod.apply(
            {"params": merged}, x, positions, bias, segment_ids=seg_ids
        )
        return out

    for i in range(c.num_layers):
        key = f"layer_{i}"
        x = layer_step(x, base[key], lora.get(key, {}))

    norm = dequantize_params(base["norm"], dtype=dt)
    x = RMSNorm(c.rms_norm_eps).apply({"params": norm}, x)
    if c.tie_word_embeddings:
        head_kernel = embed["embedding"].T
    else:
        head = deq_merge(base["lm_head"], lora.get("lm_head"))
        head_kernel = head["kernel"]
    return x, head_kernel


def layerwise_lm_logits(config, lora_config, lora, base_params, batch):
    """Full ``[B, S, vocab]`` fp32 logits via the layerwise trunk (see
    ``_layerwise_trunk``).  Training uses ``layerwise_lm_loss`` instead,
    which never materializes this tensor."""
    x, head_kernel = _layerwise_trunk(config, lora_config, lora, base_params, batch)
    return jnp.einsum(
        "blh,hv->blv", x.astype(jnp.float32), head_kernel.astype(jnp.float32)
    )


def layerwise_lm_loss(config, lora_config, lora, base_params, batch,
                      chunk: int = 256) -> jnp.ndarray:
    """Next-token CE via the layerwise trunk with a **sequence-chunked**
    head: logits are computed ``chunk`` positions at a time inside
    ``jax.checkpoint``, so the full ``[B, S, vocab]`` fp32 logits (262 MB at
    B=1/S=2048/V=32000 — and ~4× that with softmax temps and the backward's
    dlogits) are never live.  Per-position CE is independent along the
    sequence, so chunking is the same math as ``causal_lm_loss`` on full
    logits up to fp summation order.
    """
    x, head_kernel = _layerwise_trunk(config, lora_config, lora, base_params, batch)
    labels = batch["labels"]
    bsz, qlen, hid = x.shape
    # shift once: position t is scored against label t+1; the last position
    # gets IGNORE so every chunk shares one code path
    shifted = jnp.concatenate(
        [labels[:, 1:], jnp.full((bsz, 1), IGNORE_INDEX, labels.dtype)], axis=1
    )
    chunk = min(chunk, qlen)
    n_chunks = -(-qlen // chunk)
    pad = n_chunks * chunk - qlen
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        shifted = jnp.pad(shifted, ((0, 0), (0, pad)), constant_values=IGNORE_INDEX)
    # scan over chunks: [n_chunks, B, chunk, hid]
    x_chunks = x.reshape(bsz, n_chunks, chunk, hid).transpose(1, 0, 2, 3)
    lab_chunks = shifted.reshape(bsz, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_ce(xc, labc, head):
        logits = jax.lax.dot_general(
            xc, head,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, chunk, vocab] fp32 — the only logits buffer ever live
        valid = labc != IGNORE_INDEX
        safe = jnp.where(valid, labc, 0)
        logz = jax.scipy.special.logsumexp(logits, axis=-1)
        tok = logz - jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        tok = jnp.where(valid, tok, 0.0)
        return jnp.sum(tok), jnp.sum(valid)

    def body(carry, xs):
        xc, labc = xs
        s, n = chunk_ce(xc, labc, head_kernel)
        return (carry[0] + s, carry[1] + n), None

    (loss_sum, count), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.int32(0)), (x_chunks, lab_chunks)
    )
    return loss_sum / jnp.maximum(count, 1)


def causal_lm_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Next-token CE averaged over non-ignored positions (HF semantics)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    log_probs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_loss = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
    token_loss = jnp.where(valid, token_loss, 0.0)
    return jnp.sum(token_loss) / jnp.maximum(jnp.sum(valid), 1)


class Doc2QueryFineTuner:
    """LoRA fine-tuning loop over (document, query) pairs.

    ``quantize_base``: ``None`` keeps the frozen base in its fp dtype;
    ``"int8"`` / ``"int4"`` store it quantized in HBM (per-channel symmetric;
    int4 packs two nibbles per byte) and dequantize inside the jitted step —
    the TPU counterpart of the reference's NF4 4-bit QLoRA base
    (finetune.py:103-108, finetune_4bit.py:53-59).  Adapters stay fp32 and
    are the only gradient path either way.
    """

    def __init__(
        self,
        params,
        config: LlamaConfig,
        tokenizer,
        lora_config: LoraConfig = LoraConfig(r=16, alpha=32),
        lr: float = 2e-4,
        prompt_template: str = PROMPT_EN,
        max_length: int = 2048,
        eos_token_id: int = 2,
        pad_token_id: int = 0,
        bos_token_id: int = 1,
        seed: int = 0,
        quantize_base_int8: bool = False,
        quantize_base: Optional[str] = None,
        max_grad_norm: Optional[float] = None,
        # optax.adamw's own default; kept as the explicit default so adding
        # the knob did not change how existing fine-tune runs train
        weight_decay: float = 1e-4,
        # None = auto: per-layer dequant+merge under jax.checkpoint when the
        # base is quantized and the model is deep (the merged-tree schedule
        # holds all dequantized weights live — OOM at 7B on 16 GB)
        layerwise: Optional[bool] = None,
    ):
        self.base_params = params
        self.config = config
        self.tokenizer = tokenizer
        self.lora_config = lora_config
        self.prompt_template = prompt_template
        self.max_length = max_length
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        self.bos_token_id = bos_token_id
        self.module = LlamaModel(config)
        self.lora = init_lora_params(params, lora_config, jax.random.PRNGKey(seed))
        if not jax.tree_util.tree_leaves(self.lora):
            # a PRE-quantized tree has {"q","s"} leaves under each kernel, so
            # the target scan finds nothing — training would be a silent
            # no-op (pass the fp tree; quantization happens here)
            raise ValueError(
                "no LoRA targets found in params — pass full-precision "
                "params (quantize via quantize_base=...), and check "
                "lora_config.targets"
            )
        if quantize_base_int8 and quantize_base is None:
            quantize_base = "int8"
        if quantize_base is not None:
            from ..models import quantization as qz

            quantizers = {"int8": qz.quantize_params_int8, "int4": qz.quantize_params_int4}
            if quantize_base not in quantizers:
                raise ValueError(f"quantize_base must be int8/int4/None, got {quantize_base!r}")
            # quantize on host, then upload ONCE: numpy leaves passed into
            # the jitted step would re-transfer the whole frozen base
            # host->HBM every training step
            self.base_params = jax.device_put(
                quantizers[quantize_base](jax.device_get(params))
            )
        self.quantize_base = quantize_base
        chain = [optax.adamw(lr, weight_decay=weight_decay)]
        if max_grad_norm is not None:
            chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
        self.tx = optax.chain(*chain)
        self.opt_state = self.tx.init(self.lora)

        if layerwise is None:
            layerwise = quantize_base is not None and config.num_layers >= 16
        self.layerwise = layerwise
        module, lcfg = self.module, lora_config

        def loss_fn(lora, base_params, batch):
            from ..models.quantization import dequantize_params

            if layerwise:
                return layerwise_lm_loss(
                    config, lcfg, lora, base_params, batch
                )
            base = dequantize_params(base_params, dtype=jnp.dtype(config.dtype))
            merged = lora_forward_params(base, lora, lcfg)
            logits, _ = module.apply(
                {"params": merged}, batch["input_ids"], batch["attention_mask"]
            )
            return causal_lm_loss(logits, batch["labels"])

        # donate lora+opt_state: the updated trees alias the old buffers
        # in-place instead of doubling adapter+Adam state in HBM (the
        # un-donated outputs were a third copy of ~0.5 GB at 7B geometry,
        # right at the 16 GB cliff)
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(lora, opt_state, base_params, batch):
            loss, grads = jax.value_and_grad(loss_fn)(lora, base_params, batch)
            updates, opt_state = self.tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        self._train_step = train_step

    def make_batch(self, pairs: List[Tuple[str, str]]) -> Dict[str, np.ndarray]:
        examples = [
            build_example(
                self.tokenizer, doc, query, self.prompt_template,
                self.max_length, self.eos_token_id, self.bos_token_id
            )
            for doc, query in pairs
        ]
        return collate_examples(examples, self.pad_token_id)

    def train(
        self,
        pairs: Iterable[Tuple[str, str]],
        batch_size: int = 4,
        total_steps: Optional[int] = None,
        log_every: int = 10,
    ) -> float:
        total_loss, step = 0.0, 0
        batch: List[Tuple[str, str]] = []
        stop = False
        for pair in pairs:
            batch.append(pair)
            if len(batch) < batch_size:
                continue
            arrays = self.make_batch(batch)
            batch = []
            self.lora, self.opt_state, loss = self._train_step(
                self.lora, self.opt_state, self.base_params, arrays
            )
            total_loss += float(loss)
            step += 1
            if step % log_every == 0:
                logger.info(f"finetune step {step} loss {float(loss):.4f}")
            if total_steps is not None and step >= total_steps:
                stop = True
                break
        if batch and not stop:
            # trailing flush: fewer pairs than batch_size must still train
            # (dropping it makes a small fine-tune a silent no-op)
            self.lora, self.opt_state, loss = self._train_step(
                self.lora, self.opt_state, self.base_params, self.make_batch(batch)
            )
            total_loss += float(loss)
            step += 1
        return total_loss / max(step, 1)

    def merged_params(self):
        """Base weights with adapters folded in (reference finetune/merge.py).
        A quantized base dequantizes to fp32 first, like peft's
        merge_and_unload on a 4-bit model."""
        from ..models.quantization import dequantize_params
        from .lora import merge_lora

        base = dequantize_params(self.base_params, dtype=jnp.float32)
        return merge_lora(base, self.lora, self.lora_config)

    def save_adapter(self, path) -> None:
        from ..core.checkpoint import save_params

        save_params(path, self.lora)

    @classmethod
    def trl_4bit(cls, params, config: LlamaConfig, tokenizer, **overrides):
        """The reference's ``finetune_4bit.py`` (TRL SFTTrainer) variant:
        4-bit frozen base, LoRA r=64 alpha=16, lr 2e-4, clip 0.3, weight
        decay 0.001 (finetune_4bit.py:22-41).  TPU-native: packed-int4 base
        dequantized inside the jitted step instead of bitsandbytes NF4."""
        kwargs = dict(
            lora_config=LoraConfig(r=64, alpha=16),
            lr=2e-4,
            quantize_base="int4",
            max_grad_norm=0.3,
            weight_decay=0.001,
        )
        kwargs.update(overrides)
        return cls(params, config, tokenizer, **kwargs)
