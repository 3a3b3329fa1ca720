"""Multi-chip scaling: device meshes and sharded pipeline steps."""
