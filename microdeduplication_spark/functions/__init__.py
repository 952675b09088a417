"""Column-level functions: normalization, shingling, signatures, text stats."""
