"""Data layer: retrieval pools, batch iterators, MSMD/synthetic piece loading."""
