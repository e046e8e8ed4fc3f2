"""The flagship decode pipeline (host orchestration around the fused kernel)."""
