"""Retrieval services: embedding wrapper, piece-ID servers, alignment."""
