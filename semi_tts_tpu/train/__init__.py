"""Solvers, optimization, checkpointing — the runtime around the jitted steps."""
