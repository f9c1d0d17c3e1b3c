"""Model registry and the `DeepChopper` factory.

Mirrors the reference's model surface (reference: deepchopper/models/dc_hg.py:9-163,
deepchopper/cli.py:120-131): named architectures -> flax module + init, plus
checkpoint load/save. Pretrained torch checkpoints convert through
`models.convert` when a local torch checkpoint is available (this environment
has no network egress, so `from_pretrained` requires a local path or cache).
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .classifier import CaduceusTokenClassifier, HyenaTokenClassifier, TransformerTokenClassifier
from .config import (
    CADUCEUS_CONFIGS,
    HYENA_CONFIGS,
    CnnConfig,
    HeadConfig,
    HyenaConfig,
    TransformerConfig,
)
from .head import BenchmarkCNN

# Registry of backbone names, mirroring the reference's supported set
# (reference: deepchopper/models/llm/caduceus.py:5-55, cli.py:120-131).
MODEL_REGISTRY: dict[str, Callable[[], Any]] = {}


def register(name: str):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn

    return deco


@dataclasses.dataclass
class ModelBundle:
    """A model definition plus its (possibly untrained) parameters."""

    module: Any
    params: Any
    name: str
    config: Any

    def apply(self, input_ids: jnp.ndarray, input_quals: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply({"params": self.params}, input_ids, input_quals)


def _default_head() -> HeadConfig:
    return HeadConfig(
        input_size=256,
        lin1_size=1024,
        lin2_size=1024,
        num_class=2,
        use_identity_layer_for_qual=True,
        use_qual=True,
    )


@register("hyenadna-small-32k-seqlen")
@register("rna002")
@register("rna004")
def _hyena_small() -> Any:
    return HyenaTokenClassifier(
        backbone_config=HYENA_CONFIGS["hyenadna-small-32k-seqlen"],
        head_config=_default_head(),
    )


@register("hyenadna-tiny-1k-seqlen")
def _hyena_tiny() -> Any:
    return HyenaTokenClassifier(
        backbone_config=HYENA_CONFIGS["hyenadna-tiny-1k-seqlen"],
        head_config=dataclasses.replace(_default_head(), input_size=128),
    )


@register("transformer")
def _transformer() -> Any:
    return TransformerTokenClassifier(
        backbone_config=TransformerConfig(), head_config=_default_head()
    )


@register("cnn")
def _cnn() -> Any:
    return BenchmarkCNN(config=CnnConfig())


@register("caduceus-ph_seqlen-131k_d_model-256_n_layer-16")
def _caduceus_131k() -> Any:
    return CaduceusTokenClassifier(
        backbone_config=CADUCEUS_CONFIGS["caduceus-ph_seqlen-131k_d_model-256_n_layer-16"],
        head_config=_default_head(),
    )


@register("caduceus-ps_seqlen-131k_d_model-256_n_layer-16")
def _caduceus_131k_ps() -> Any:
    """Untied (separate reverse-mixer) variant
    (reference: deepchopper/models/llm/caduceus.py:5-55, caduceus-ps_*)."""
    return CaduceusTokenClassifier(
        backbone_config=CADUCEUS_CONFIGS["caduceus-ps_seqlen-131k_d_model-256_n_layer-16"],
        head_config=_default_head(),
    )


@register("caduceus-tiny")
def _caduceus_tiny() -> Any:
    from .config import CADUCEUS_TINY

    return CaduceusTokenClassifier(
        backbone_config=CADUCEUS_TINY,
        head_config=dataclasses.replace(_default_head(), input_size=64, lin1_size=128, lin2_size=128),
    )


@register("caduceus-tiny-ps")
def _caduceus_tiny_ps() -> Any:
    from .config import CADUCEUS_TINY_PS

    return CaduceusTokenClassifier(
        backbone_config=CADUCEUS_TINY_PS,
        head_config=dataclasses.replace(_default_head(), input_size=64, lin1_size=128, lin2_size=128),
    )


def build_model(name: str, head_overrides: dict | None = None) -> Any:
    """Build a registered model, optionally overriding head hyperparameters
    (the reference's sweeper tunes model.net.head.lin1_size /
    use_identity_layer_for_qual, configs/hparams_search/hyena_optuna.yaml:50-52).
    `lin1_size` implies `lin2_size` (the head requires them equal)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    module = MODEL_REGISTRY[name]()
    if head_overrides:
        over = dict(head_overrides)
        if "lin1_size" in over and "lin2_size" not in over:
            over["lin2_size"] = over["lin1_size"]
        if not hasattr(module, "head_config"):
            raise ValueError(f"model {name!r} has no tunable head")
        module = dataclasses.replace(
            module, head_config=dataclasses.replace(module.head_config, **over)
        )
    return module


def init_params(module: Any, seed: int = 0, seq_len: int = 1024, batch: int = 1) -> Any:
    """Initialize parameters with a tiny dummy batch (shapes don't bind L)."""
    rng = jax.random.PRNGKey(seed)
    ids = jnp.zeros((batch, seq_len), dtype=jnp.int32)
    quals = jnp.zeros((batch, seq_len), dtype=jnp.float32)
    variables = module.init(rng, ids, quals)
    return variables["params"]


# ---------------------------------------------------------------------------
# Checkpoint save/load (msgpack via flax serialization)
# ---------------------------------------------------------------------------


def save_checkpoint(path: str | Path, params: Any, metadata: dict | None = None) -> None:
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(params)
    payload = {"params_msgpack": blob, "metadata": metadata or {}}
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as fh:
        pickle.dump(payload, fh, protocol=4)
    tmp.replace(path)


def load_checkpoint(path: str | Path, template_params: Any) -> tuple[Any, dict]:
    from flax import serialization

    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    params = serialization.from_bytes(template_params, payload["params_msgpack"])
    # from_bytes restores by tree structure and takes shapes from the
    # serialized arrays — it does NOT validate them against the template, and
    # flax apply would then silently run with the checkpoint's shapes. Fail
    # loudly instead: a shape mismatch means the model config (e.g. a sweep
    # trial's head_overrides) doesn't match the checkpoint.
    mismatches = [
        f"{jax.tree_util.keystr(kp)}: checkpoint {np.shape(a)} vs model {np.shape(b)}"
        for (kp, a), b in zip(
            jax.tree_util.tree_leaves_with_path(params), jax.tree.leaves(template_params)
        )
        if np.shape(a) != np.shape(b)
    ]
    if mismatches:
        raise ValueError(
            f"checkpoint {path} does not match the model configuration "
            f"({len(mismatches)} shape mismatches): " + "; ".join(mismatches[:5])
        )
    return params, payload.get("metadata", {})


# ---------------------------------------------------------------------------
# DeepChopper factory (reference: deepchopper/models/dc_hg.py)
# ---------------------------------------------------------------------------


class DeepChopper:
    """Factory with the reference's entrypoints, returning `ModelBundle`s."""

    PRETRAINED_ALIASES = {
        "yangliz5/deepchopper": "rna002",
        "yangliz5/deepchopper-rna004": "rna004",
        "rna002": "rna002",
        "rna004": "rna004",
    }

    @staticmethod
    def new(
        name: str = "hyenadna-small-32k-seqlen",
        seed: int = 0,
        head_overrides: dict | None = None,
    ) -> ModelBundle:
        module = build_model(name, head_overrides)
        params = init_params(module, seed=seed)
        return ModelBundle(module=module, params=params, name=name, config=getattr(module, "backbone_config", None))

    @staticmethod
    def from_checkpoint(
        checkpoint_path: str | Path,
        name: str = "hyenadna-small-32k-seqlen",
        head_overrides: dict | None = None,
    ) -> ModelBundle:
        """Load a native checkpoint saved by `save_checkpoint`
        (reference capability: dc_hg.py `from_checkpoint`). `head_overrides`
        must match the overrides the checkpoint was trained with (the sweep's
        test-on-best path rebuilds non-default-head trials through here)."""
        bundle = DeepChopper.new(name, head_overrides=head_overrides)
        params, _meta = load_checkpoint(checkpoint_path, bundle.params)
        return dataclasses.replace(bundle, params=params)

    @staticmethod
    def from_pretrained(
        model_name: str,
        torch_checkpoint: str | Path | None = None,
        random_init: bool = False,
    ) -> ModelBundle:
        """Load pretrained weights (reference: dc_hg.py `from_pretrained`).

        With no network egress, pass `torch_checkpoint` pointing at a local
        torch state_dict / HF snapshot of the reference checkpoint; it is
        converted to a JAX pytree via `models.convert`. When no checkpoint can
        be found this is a HARD ERROR — silent random weights produce garbage
        predictions. Pass `random_init=True` (CLI: `--random-init`) only for
        tests/benchmarks.
        """
        local = Path(model_name)
        if local.is_dir() and (local / "config.json").exists():
            return DeepChopper.from_pretrained_dir(local)
        name = DeepChopper.PRETRAINED_ALIASES.get(model_name, model_name)
        bundle = DeepChopper.new(name)
        if torch_checkpoint is not None:
            from .convert import convert_torch_state_dict

            params = convert_torch_state_dict(torch_checkpoint, bundle.params)
            return dataclasses.replace(bundle, params=params)
        if random_init:
            import logging

            logging.getLogger(__name__).warning(
                "random_init=True: %s is using UNTRAINED weights", model_name
            )
            return bundle
        raise FileNotFoundError(
            f"no pretrained weights available for {model_name!r}: this environment has "
            "no network egress, so pass --torch-checkpoint <path to the reference torch "
            "state_dict / HF snapshot> or --checkpoint <native checkpoint>. "
            "Use --random-init to run with untrained weights (tests/benchmarks only)."
        )

    @staticmethod
    def to_checkpoint(bundle: ModelBundle, path: str | Path) -> None:
        save_checkpoint(path, bundle.params, {"name": bundle.name})

    @staticmethod
    def save_pretrained(bundle: ModelBundle, directory: str | Path) -> Path:
        """Write an HF-hub-style local model folder: config.json + weights.

        The layout `from_pretrained` accepts as a directory path, so models
        round-trip share-ably without network access (reference capability:
        dc_hg.py `to_hub` via PyTorchModelHubMixin, minus the upload)."""
        import json

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        cfg = bundle.config
        cfg_dict = dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else {}
        (directory / "config.json").write_text(
            json.dumps({"model_name": bundle.name, "backbone": cfg_dict}, indent=1)
        )
        save_checkpoint(directory / "model.dc", bundle.params, {"name": bundle.name})
        return directory

    @staticmethod
    def from_pretrained_dir(directory: str | Path) -> ModelBundle:
        """Load a folder written by `save_pretrained`."""
        import json

        directory = Path(directory)
        meta = json.loads((directory / "config.json").read_text())
        bundle = DeepChopper.new(meta["model_name"])
        params, _ = load_checkpoint(directory / "model.dc", bundle.params)
        return dataclasses.replace(bundle, params=params)

    @staticmethod
    def to_hub(bundle: ModelBundle, repo_id: str, directory: str | Path | None = None) -> Path:
        """Prepare a hub upload folder (reference: dc_hg.py `to_hub`).

        This environment has no network egress, so the folder is written
        locally (`save_pretrained` layout) for a later `huggingface-cli
        upload <repo_id> <folder>` from a connected machine."""
        directory = Path(directory or f"hub_upload_{repo_id.replace('/', '_')}")
        return DeepChopper.save_pretrained(bundle, directory)
