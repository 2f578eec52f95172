"""Inference / evaluation pipelines."""
