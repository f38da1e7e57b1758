"""Ray Data batch stages: Arrow-in/Arrow-out wrappers over the kernels."""
