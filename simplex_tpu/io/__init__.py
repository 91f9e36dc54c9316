"""io subpackage of simplex_tpu."""
