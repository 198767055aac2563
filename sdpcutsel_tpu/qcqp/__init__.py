from .chordal import chordal_decomposition, clique_candidates  # noqa: F401
