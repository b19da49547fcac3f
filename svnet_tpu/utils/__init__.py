"""Utilities: PyTorch checkpoint conversion, complexity analysis."""
