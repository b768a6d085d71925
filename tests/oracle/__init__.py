"""Executable oracles standing in for the unreadable reference (SURVEY.md §0, §4).

``frontend_oracle`` reimplements the VGGish ``mel_features.py`` semantics in
plain NumPy; ``model_oracle`` reimplements the paper's model math (C4-C8) in
torch-cpu. These are the parity contract for the JAX/Pallas implementations.
"""
