"""kernels subpackage of simplex_tpu."""
