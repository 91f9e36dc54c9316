"""dist subpackage of simplex_tpu."""
