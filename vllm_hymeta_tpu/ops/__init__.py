"""TPU compute ops: pure-jnp reference implementations (`naive`) and Pallas
kernels for the hot paths. Every kernel has a naive twin used as its spec in
tests (SURVEY.md §4)."""
