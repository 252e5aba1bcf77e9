"""Stub of msmd.midi_parser: FPS constant + notes_to_onsets.

Matches the real package's contract: note events are rows whose first
column is the onset time in seconds; ``notes_to_onsets`` returns the sorted
unique onset FRAME indices as a numpy array (callers treat a single-event
result as a scalar-like)."""

import numpy as np

FPS = 20


def notes_to_onsets(notes, dt):
    notes = np.atleast_2d(np.asarray(notes, dtype=float))
    onsets = np.ceil(notes[:, 0] / dt).astype(int)
    return np.sort(np.unique(onsets))
