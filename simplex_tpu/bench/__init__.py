"""bench subpackage of simplex_tpu."""
