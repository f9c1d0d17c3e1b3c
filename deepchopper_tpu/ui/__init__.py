"""Web UI (gradio-gated)."""
