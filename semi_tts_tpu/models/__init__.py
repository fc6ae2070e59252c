"""Functional model library: pure init/apply functions over pytree params."""
