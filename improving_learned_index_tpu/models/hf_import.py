"""HuggingFace checkpoint import: torch BERT/RoBERTa/XLM-R -> flax params.

Converts a torch state dict (e.g. ``Luyu/co-condenser-marco``,
``vinai/phobert-base-v2``, ``xlm-roberta-base``, or a fine-tuned reference
checkpoint's ``model_state_dict`` — reference utils/checkpoint.py:68-84) into
the parameter tree of models.encoder.TransformerEncoder / DeepImpactModel.
Weights are re-laid-out, never re-trained: torch ``Linear`` stores [out, in],
flax ``Dense`` stores [in, out]; attention projections reshape to
[in, heads, head_dim] for the fused DenseGeneral.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..core.config import EncoderConfig

_TRUNK_PREFIXES = ("bert.", "roberta.", "model.", "")


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _strip_prefix(state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Normalize key prefixes: the trunk may live under bert./roberta./none."""
    out = {}
    for k, v in state.items():
        out[k] = _to_numpy(v)
    for prefix in ("bert.", "roberta."):
        if any(k.startswith(prefix + "embeddings") for k in out):
            return {
                (k[len(prefix):] if k.startswith(prefix) else k): v
                for k, v in out.items()
            }
    return out


def hf_encoder_to_flax(
    state_dict: Dict[str, Any], config: EncoderConfig
) -> Dict[str, Any]:
    """Build the flax param tree for TransformerEncoder from an HF state dict."""
    sd = _strip_prefix(state_dict)
    H, heads = config.hidden_size, config.num_heads
    hd = H // heads

    def lin(name):  # torch Linear -> flax Dense
        return {
            "kernel": sd[f"{name}.weight"].T.astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32),
        }

    def qkv(name):  # torch Linear [H, H] -> DenseGeneral [H, heads, hd]
        return {
            "kernel": sd[f"{name}.weight"].T.reshape(H, heads, hd).astype(np.float32),
            "bias": sd[f"{name}.bias"].reshape(heads, hd).astype(np.float32),
        }

    def attn_out(name):  # torch Linear [H, H] -> DenseGeneral [heads, hd, H]
        return {
            "kernel": sd[f"{name}.weight"].T.reshape(heads, hd, H).astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32),
        }

    def ln(name):
        return {
            "scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32),
        }

    params: Dict[str, Any] = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd["embeddings.word_embeddings.weight"].astype(np.float32)
            },
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"].astype(
                    np.float32
                )
            },
            "token_type_embeddings": {
                "embedding": sd["embeddings.token_type_embeddings.weight"].astype(
                    np.float32
                )
            },
            "layer_norm": ln("embeddings.LayerNorm"),
        }
    }
    for i in range(config.num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": qkv(f"{p}.attention.self.query"),
                "key": qkv(f"{p}.attention.self.key"),
                "value": qkv(f"{p}.attention.self.value"),
                "output_dense": attn_out(f"{p}.attention.output.dense"),
            },
            "attention_norm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_norm": ln(f"{p}.output.LayerNorm"),
        }
    return params


def hf_deep_impact_to_flax(
    state_dict: Dict[str, Any],
    config: EncoderConfig,
    head_key: str = "impact_score_encoder.0",
    seed: int = 0,
) -> Dict[str, Any]:
    """Full DeepImpactModel params: trunk + impact head.

    The head (``impact_score_encoder.0`` in reference checkpoints,
    original.py:44-47) is randomly initialized when absent (fresh HF trunk).
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items()}
    params = {"encoder": hf_encoder_to_flax(sd, config)}
    wkey, bkey = f"{head_key}.weight", f"{head_key}.bias"
    if wkey in sd:
        head = {
            "dense": {
                "kernel": sd[wkey].T.astype(np.float32),
                "bias": sd[bkey].astype(np.float32),
            }
        }
    else:
        rng = np.random.default_rng(seed)
        limit = float(np.sqrt(6.0 / (config.hidden_size + 1)))
        head = {
            "dense": {
                "kernel": rng.uniform(-limit, limit, (config.hidden_size, 1)).astype(
                    np.float32
                ),
                "bias": np.zeros((1,), dtype=np.float32),
            }
        }
    params["impact_head"] = head
    return params


def flax_deep_impact_to_hf(
    params: Dict[str, Any],
    config: EncoderConfig,
    head_key: str = "impact_score_encoder.0",
    trunk_prefix: str = "bert.",
) -> Dict[str, np.ndarray]:
    """Exact inverse of ``hf_deep_impact_to_flax``: flax param tree ->
    HF-format state dict (numpy), with the reference's head keys
    (``impact_score_encoder.0``, original.py:44-47).

    Enables exporting a model trained with THIS repo's loop to the
    HF-format checkpoint layout the reference stack loads — the round-trip
    the real-weights parity gate exercises (scripts/parity_gate.py
    ``--selftest trained``).  Pure re-layout (transposes/reshapes in
    float32): export-then-import reproduces the tree bit-exactly."""
    enc = jax_to_np(params["encoder"])
    H, heads = config.hidden_size, config.num_heads
    hd = H // heads
    p = trunk_prefix
    sd: Dict[str, np.ndarray] = {}
    emb = enc["embeddings"]
    sd[p + "embeddings.word_embeddings.weight"] = emb["word_embeddings"]["embedding"]
    sd[p + "embeddings.position_embeddings.weight"] = emb["position_embeddings"][
        "embedding"
    ]
    sd[p + "embeddings.token_type_embeddings.weight"] = emb["token_type_embeddings"][
        "embedding"
    ]
    sd[p + "embeddings.LayerNorm.weight"] = emb["layer_norm"]["scale"]
    sd[p + "embeddings.LayerNorm.bias"] = emb["layer_norm"]["bias"]
    for i in range(config.num_layers):
        L = enc[f"layer_{i}"]
        q = f"{p}encoder.layer.{i}"
        for name in ("query", "key", "value"):
            k = L["attention"][name]
            sd[f"{q}.attention.self.{name}.weight"] = (
                k["kernel"].reshape(H, H).T
            )
            sd[f"{q}.attention.self.{name}.bias"] = k["bias"].reshape(H)
        ao = L["attention"]["output_dense"]
        sd[f"{q}.attention.output.dense.weight"] = ao["kernel"].reshape(H, H).T
        sd[f"{q}.attention.output.dense.bias"] = ao["bias"]
        sd[f"{q}.attention.output.LayerNorm.weight"] = L["attention_norm"]["scale"]
        sd[f"{q}.attention.output.LayerNorm.bias"] = L["attention_norm"]["bias"]
        sd[f"{q}.intermediate.dense.weight"] = L["intermediate"]["kernel"].T
        sd[f"{q}.intermediate.dense.bias"] = L["intermediate"]["bias"]
        sd[f"{q}.output.dense.weight"] = L["output"]["kernel"].T
        sd[f"{q}.output.dense.bias"] = L["output"]["bias"]
        sd[f"{q}.output.LayerNorm.weight"] = L["output_norm"]["scale"]
        sd[f"{q}.output.LayerNorm.bias"] = L["output_norm"]["bias"]
    head = jax_to_np(params["impact_head"]["dense"])
    sd[f"{head_key}.weight"] = head["kernel"].T
    sd[f"{head_key}.bias"] = head["bias"]
    return {k: np.ascontiguousarray(v.astype(np.float32)) for k, v in sd.items()}


def jax_to_np(tree):
    """Fetch a (possibly device-resident) param subtree to numpy."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def load_hf_checkpoint(
    name_or_path: str, config: Optional[EncoderConfig] = None
) -> Dict[str, Any]:
    """Load params from an HF hub id / local dir via transformers (gated)."""
    import torch
    from transformers import AutoConfig, AutoModel

    hf_model = AutoModel.from_pretrained(name_or_path)
    if config is None:
        hc = AutoConfig.from_pretrained(name_or_path)
        config = EncoderConfig(
            vocab_size=hc.vocab_size,
            hidden_size=hc.hidden_size,
            num_layers=hc.num_hidden_layers,
            num_heads=hc.num_attention_heads,
            intermediate_size=hc.intermediate_size,
            max_position_embeddings=hc.max_position_embeddings,
            type_vocab_size=getattr(hc, "type_vocab_size", 1),
            layer_norm_eps=hc.layer_norm_eps,
            pad_token_id=hc.pad_token_id or 0,
            position_offset=(hc.pad_token_id + 1)
            if hc.model_type in ("roberta", "xlm-roberta", "phobert")
            else 0,
        )
    with torch.no_grad():
        sd = hf_model.state_dict()
    return hf_deep_impact_to_flax(sd, config)
