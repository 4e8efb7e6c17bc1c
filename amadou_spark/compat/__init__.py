"""Runtime-environment compatibility shims (no third-party vendoring)."""
