"""Console, IO and config utilities."""
