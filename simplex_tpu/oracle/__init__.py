"""oracle subpackage of simplex_tpu."""
