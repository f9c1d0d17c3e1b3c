"""Torch -> JAX checkpoint conversion for reference DeepChopper weights.

Maps the reference's Lightning/HF state-dict layout
(reference: deepchopper/models/dc_hg.py:90-163 — `net.backbone` is the HF
hyenadna port, `net.head` the MLP head) onto the flax pytree produced by
`HyenaTokenClassifier`. One-time host-side conversion; per-base prediction
parity is then validated on the reference fixtures.

This environment has no network egress, so conversion runs only when the user
supplies a local torch checkpoint (state_dict file or Lightning .ckpt).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import numpy as np


def _load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().to(torch.float32).numpy()
    return out


def _strip_prefixes(sd: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Normalize key prefixes across Lightning / HF hub layouts."""
    out = {}
    for k, v in sd.items():
        for prefix in ("net.", "model.", "module."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
        out[k] = v
    return out


def _find(sd: dict[str, np.ndarray], *candidates: str) -> np.ndarray:
    for cand in candidates:
        if cand in sd:
            return sd[cand]
    # fuzzy: suffix match
    for cand in candidates:
        hits = [k for k in sd if k.endswith(cand)]
        if len(hits) == 1:
            return sd[hits[0]]
    raise KeyError(f"none of {candidates} found in torch state dict ({len(sd)} keys)")


def convert_torch_state_dict(path: str | Path, template_params: Any) -> Any:
    """Convert a reference torch checkpoint into our flax param pytree.

    Dispatches on the template structure: Hyena blocks (mixer/filter_fn) or
    Caduceus blocks (bimamba) — the two backbone families the reference ships
    checkpoints for (reference: deepchopper/models/llm/{hyena,caduceus}.py).
    """
    import jax

    sd = _strip_prefixes(_load_torch_state_dict(path))
    params = jax.tree_util.tree_map(np.asarray, template_params)
    p = {k: dict(v) if isinstance(v, dict) else v for k, v in params.items()}

    bb = p["backbone"]
    n_layer = sum(1 for k in bb if k.startswith("block_"))
    if n_layer and "bimamba" in bb["block_0"]:
        return _convert_caduceus(sd, p, n_layer)

    def dense(dst: dict, torch_prefix: str) -> None:
        dst["kernel"] = _find(sd, f"{torch_prefix}.weight").T
        if "bias" in dst:
            dst["bias"] = _find(sd, f"{torch_prefix}.bias")

    # Embeddings (HF port: backbone.embeddings.word_embeddings)
    emb = _find(
        sd,
        "backbone.backbone.embeddings.word_embeddings.weight",
        "backbone.embeddings.word_embeddings.weight",
        "embeddings.word_embeddings.weight",
    )
    vocab = bb["word_embeddings"]["embedding"].shape[0]
    bb["word_embeddings"]["embedding"] = emb[:vocab]

    for i in range(n_layer):
        blk = bb[f"block_{i}"]
        for pt in (
            f"backbone.backbone.layers.{i}",
            f"backbone.layers.{i}",
            f"layers.{i}",
        ):
            if any(k.startswith(pt + ".") for k in sd):
                break
        blk["norm1"]["scale"] = _find(sd, f"{pt}.norm1.weight")
        blk["norm1"]["bias"] = _find(sd, f"{pt}.norm1.bias")
        blk["norm2"]["scale"] = _find(sd, f"{pt}.norm2.weight")
        blk["norm2"]["bias"] = _find(sd, f"{pt}.norm2.bias")
        dense(blk["mlp"]["fc1"], f"{pt}.mlp.fc1")
        dense(blk["mlp"]["fc2"], f"{pt}.mlp.fc2")
        mixer = blk["mixer"]
        dense(mixer["in_proj"], f"{pt}.mixer.in_proj")
        dense(mixer["out_proj"], f"{pt}.mixer.out_proj")
        # torch depthwise Conv1d weight: (channels, 1, k) -> ours (k, 1, channels)
        w_short = _find(sd, f"{pt}.mixer.short_filter.weight")
        mixer["short_filter_kernel"] = np.transpose(w_short, (2, 1, 0))
        mixer["short_filter_bias"] = _find(sd, f"{pt}.mixer.short_filter.bias")
        filt = mixer["filter_fn"]
        filt["bias"] = _find(sd, f"{pt}.mixer.filter_fn.bias")
        # implicit filter MLP: Sequential indices 0 (in), 1 (sin), 2,3,4,5..., last (out)
        seq_keys = sorted(
            {
                int(k.split(".")[-2])
                for k in sd
                if k.startswith(f"{pt}.mixer.filter_fn.implicit_filter.")
                and k.split(".")[-1] in ("weight", "bias", "freq")
            }
        )
        linear_idxs = [
            j for j in seq_keys if f"{pt}.mixer.filter_fn.implicit_filter.{j}.weight" in sd
        ]
        freq_idxs = [
            j for j in seq_keys if f"{pt}.mixer.filter_fn.implicit_filter.{j}.freq" in sd
        ]
        dense(filt["mlp_in"], f"{pt}.mixer.filter_fn.implicit_filter.{linear_idxs[0]}")
        for inner_i, j in enumerate(linear_idxs[1:-1]):
            dense(filt[f"mlp_{inner_i}"], f"{pt}.mixer.filter_fn.implicit_filter.{j}")
        filt["mlp_out"]["kernel"] = _find(
            sd, f"{pt}.mixer.filter_fn.implicit_filter.{linear_idxs[-1]}.weight"
        ).T
        for sin_i, j in enumerate(freq_idxs):
            key = f"sin_freq_{sin_i}"
            if key in filt:
                filt[key] = _find(sd, f"{pt}.mixer.filter_fn.implicit_filter.{j}.freq").reshape(
                    filt[key].shape
                )

    bb["ln_f"]["scale"] = _find(sd, "backbone.backbone.ln_f.weight", "backbone.ln_f.weight", "ln_f.weight")
    bb["ln_f"]["bias"] = _find(sd, "backbone.backbone.ln_f.bias", "backbone.ln_f.bias", "ln_f.bias")

    _convert_head(sd, p["head"])

    return jax.tree_util.tree_map(np.asarray, p)


def _convert_head(sd: dict[str, np.ndarray], head: dict) -> None:
    """Shared MLP head mapping (reference: deepchopper/models/llm/head.py:39-102)."""
    for lin in ("linear1", "linear2", "linear3"):
        head[lin]["kernel"] = _find(sd, f"head.{lin}.weight").T
        if "bias" in head[lin]:
            head[lin]["bias"] = _find(sd, f"head.{lin}.bias")
    if "qual_linear1" in head:
        head["qual_linear1"]["kernel"] = _find(sd, "head.qual_linear1.weight").T
        if "bias" in head["qual_linear1"]:
            head["qual_linear1"]["bias"] = _find(sd, "head.qual_linear1.bias")


def _convert_caduceus(sd: dict[str, np.ndarray], p: dict, n_layer: int) -> Any:
    """Map the HF Caduceus-ph state dict (bidirectional weight-tied Mamba)
    onto the CaduceusBackbone pytree (reference family:
    kuleshov-group/caduceus-ph_*, consumed at deepchopper/models/llm/
    caduceus.py:5-55)."""
    import jax

    bb = p["backbone"]
    emb = _find(
        sd,
        "backbone.backbone.embeddings.word_embeddings.weight",
        "backbone.embeddings.word_embeddings.weight",
        "embeddings.word_embeddings.weight",
    )
    vocab = bb["word_embeddings"]["embedding"].shape[0]
    bb["word_embeddings"]["embedding"] = emb[:vocab]

    for i in range(n_layer):
        blk = bb[f"block_{i}"]
        for pt in (
            f"backbone.backbone.layers.{i}",
            f"backbone.layers.{i}",
            f"layers.{i}",
        ):
            if any(k.startswith(pt + ".") for k in sd):
                break
        blk["norm"]["scale"] = _find(sd, f"{pt}.norm.weight")
        def load_mixer(mixer: dict, mx: str) -> None:
            mixer["in_proj"]["kernel"] = _find(sd, f"{mx}.in_proj.weight").T
            # torch depthwise Conv1d weight (channels, 1, k) -> ours (k, 1, channels)
            mixer["conv1d_kernel"] = np.transpose(_find(sd, f"{mx}.conv1d.weight"), (2, 1, 0))
            mixer["conv1d_bias"] = _find(sd, f"{mx}.conv1d.bias")
            mixer["x_proj"]["kernel"] = _find(sd, f"{mx}.x_proj.weight").T
            mixer["dt_proj"]["kernel"] = _find(sd, f"{mx}.dt_proj.weight").T
            mixer["dt_proj"]["bias"] = _find(sd, f"{mx}.dt_proj.bias")
            mixer["A_log"] = _find(sd, f"{mx}.A_log")
            mixer["D"] = _find(sd, f"{mx}.D")
            mixer["out_proj"]["kernel"] = _find(sd, f"{mx}.out_proj.weight").T

        # "ph" ties forward/reverse weights; mamba_fwd carries the params.
        for mx in (f"{pt}.mixer.mamba_fwd", f"{pt}.mixer.submodule.mamba_fwd", f"{pt}.mixer"):
            if any(k.startswith(mx + ".") for k in sd):
                break
        load_mixer(blk["bimamba"]["mixer"], mx)
        if "mixer_rev" in blk["bimamba"]:
            # "ps" (untied): separate reverse-mixer params under mamba_rev
            # (reference family: caduceus-ps_*, deepchopper/models/llm/
            # caduceus.py:5-55).
            for mr in (f"{pt}.mixer.mamba_rev", f"{pt}.mixer.submodule.mamba_rev"):
                if any(k.startswith(mr + ".") for k in sd):
                    break
            else:
                raise KeyError(
                    f"untied (ps) model expects {pt}.mixer.mamba_rev.* keys in the checkpoint"
                )
            load_mixer(blk["bimamba"]["mixer_rev"], mr)

    bb["norm_f"]["scale"] = _find(
        sd, "backbone.backbone.norm_f.weight", "backbone.norm_f.weight", "norm_f.weight"
    )
    if "head" in p:
        _convert_head(sd, p["head"])
    return jax.tree_util.tree_map(np.asarray, p)
