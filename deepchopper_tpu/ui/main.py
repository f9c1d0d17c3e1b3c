"""Gradio single-record demo (reference: deepchopper/ui/main.py:21-189).

Paste one FASTQ record; the model predicts per-base adapter labels, smooths
them, and the chopped segments are highlighted. Gradio is an optional
dependency (not baked into this environment); `predict_record` below is the
UI-independent core and is unit-tested directly.
"""

from __future__ import annotations

import numpy as np

from .. import default
from ..data.bucketing import encode_read
from ..io.chop import remove_intervals_and_keep_left
from ..ops.labels import smooth_label_region
from ..ops.qual import encode_qual
from ..ops.sequence import normalize_seq
from ..utils.vis import highlight_targets


def parse_fq_record(text: str) -> tuple[str, str, str]:
    """Parse a pasted 4-line FASTQ record (reference: ui/main.py:21-36)."""
    lines = [ln.strip() for ln in text.strip().splitlines() if ln.strip()]
    if len(lines) < 4 or not lines[0].startswith("@"):
        raise ValueError("expected a 4-line FASTQ record starting with '@'")
    rid, seq, qual = lines[0][1:], lines[1], lines[3]
    if len(seq) != len(qual):
        raise ValueError("sequence and quality lengths differ")
    return rid, seq, qual


def predict_record(
    text: str,
    bundle=None,
    smooth_window_size: int = default.SMOOTH_WINDOW_SIZE,
    min_interval_size: int = default.MIN_INTERVAL_SIZE,
    approved_interval_number: int = default.APPROVED_INTERVAL_NUMBER,
    torch_checkpoint: str | None = None,
    random_init: bool = False,
) -> dict:
    """Predict + smooth + chop one pasted record; returns display payload.

    With `bundle=None`, weights must come from `torch_checkpoint` or
    `random_init=True` — missing weights are a hard error by design.
    """
    import jax.numpy as jnp

    from ..models.registry import DeepChopper

    rid, seq, qual = parse_fq_record(text)
    seq = normalize_seq(seq)
    if bundle is None:
        bundle = DeepChopper.from_pretrained(
            "rna002", torch_checkpoint=torch_checkpoint, random_init=random_init
        )
    enc = encode_read(rid, seq, encode_qual(qual), None, max_length=32768)
    ids = jnp.asarray(enc.input_ids[None, :])
    quals = jnp.asarray(enc.quals[None, :])
    logits = np.asarray(bundle.apply(ids, quals))[0]
    labels = logits.argmax(-1)[: len(seq)].astype(np.int8)
    intervals = smooth_label_region(
        labels, smooth_window_size, min_interval_size, approved_interval_number
    )
    kept, selected = remove_intervals_and_keep_left(seq, intervals)
    return {
        "id": rid,
        "labels": labels,
        "smooth_intervals": intervals,
        "highlighted": highlight_targets(seq, intervals, text_width=80, color=False),
        "kept_segments": [k.decode("ascii") for k in kept],
        "kept_intervals": selected,
    }


def launch(
    port: int = 7860,
    checkpoint: str | None = None,
    torch_checkpoint: str | None = None,
    random_init: bool = False,
) -> None:  # pragma: no cover - needs gradio
    try:
        import gradio as gr
    except ImportError as exc:
        raise ImportError(
            "gradio is not installed in this environment; the UI core "
            "(predict_record) works without it"
        ) from exc

    from ..models.registry import DeepChopper

    if checkpoint is not None:
        bundle = DeepChopper.from_checkpoint(checkpoint, "rna002")
    else:
        bundle = DeepChopper.from_pretrained(
            "rna002", torch_checkpoint=torch_checkpoint, random_init=random_init
        )

    def _run(text: str):
        try:
            out = predict_record(text, bundle)
        except Exception as exc:  # noqa: BLE001
            return f"error: {exc}", ""
        return str(out["smooth_intervals"]), out["highlighted"]

    with gr.Blocks(title="DeepChopper-TPU") as demo:
        gr.Markdown("# DeepChopper-TPU\nDetect and chop chimera artifacts.")
        inp = gr.Textbox(lines=6, label="FASTQ record")
        btn = gr.Button("Predict")
        intervals = gr.Textbox(label="Adapter intervals")
        highlighted = gr.Textbox(label="Highlighted sequence")
        btn.click(_run, inputs=inp, outputs=[intervals, highlighted])
    demo.launch(server_port=port)
