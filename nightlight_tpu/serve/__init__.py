"""REST live-stacking server and web UI."""
