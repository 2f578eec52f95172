"""Reference-path compatibility package (forwards to hriemo.models)."""
