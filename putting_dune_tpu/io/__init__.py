"""Record IO and serialization utilities."""
