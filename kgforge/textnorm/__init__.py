"""Text-normalization front stage (reference-semantics oracle + helpers)."""
