"""Test stub of the ``msmd`` package (CPJKU/msmd), replicating exactly the
API surface the real-MSMD loader consumes (shaped after the usage in
reference utils/data_pools.py:369-439 and utils/mutopia_data.py:21-44):

* ``msmd.data_model.piece.Piece(root=, name=)`` with ``available_scores``,
  ``available_performances``, ``load_score``, ``load_performance``
* Score: ``load_mungos()``, ``load_mungos(by_page=True)``, ``load_images()``
* mungo objects: ``objid``, ``clsname`` ('staff'/'notehead-full'),
  ``top``, ``bounding_box`` (t, l, b, r), ``middle`` (cy, cx), ``inlinks``
* Performance: ``load_note_events()``, ``load_spectrogram()``,
  ``load_midi_matrix()``
* ``msmd.alignments.align_score_to_performance(score, performance)``
  -> [(mungo objid, note-event index)]
* ``msmd.midi_parser``: ``FPS``, ``notes_to_onsets(notes, dt)``

Pieces are generated deterministically from (root, name) so tests can drive
the loader + npz exporter end-to-end without the real corpus.
"""
