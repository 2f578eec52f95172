"""Training pipelines and loss functions."""
