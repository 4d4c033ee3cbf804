"""Offline data-prep utilities (reference: src/deep_impact/scripts/ +
src/llama2/prepare_dataset.py).  Each module is a library function plus a
``python -m`` CLI."""
