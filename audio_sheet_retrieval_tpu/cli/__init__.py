"""CLI entry points (python -m audio_sheet_retrieval_tpu.cli.<name>)."""
