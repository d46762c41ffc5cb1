"""Environment families, each a pure-functional JAX rewrite."""
