"""batch subpackage of simplex_tpu."""
