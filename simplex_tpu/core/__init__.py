"""core subpackage of simplex_tpu."""
