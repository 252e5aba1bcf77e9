"""Stub of msmd.alignments.align_score_to_performance: pairs each notehead
mungo (document order: pages top-to-bottom, systems top-to-bottom, notes
left-to-right) with the corresponding note-event index."""


def align_score_to_performance(score, performance):
    from .data_model.piece import _piece_traits

    traits = _piece_traits(performance.piece.name)
    if any(t in performance.key for t in traits["broken_align_tempi"]):
        # real collections have performances whose alignment is missing or
        # unparseable -- the loader must skip the performance, not the piece
        raise KeyError(f"no alignment for performance {performance.key}")
    noteheads = []
    for page in score.load_mungos(by_page=True):
        staffs = sorted((m for m in page if m.clsname == "staff"),
                        key=lambda m: m.top)
        by_id = {m.objid: m for m in page}
        for staff in staffs:
            notes = [by_id[i] for i in staff.inlinks]
            notes.sort(key=lambda m: m.middle[1])
            noteheads.extend(notes)
    n_events = len(performance.load_note_events())
    return [(m.objid, i) for i, m in enumerate(noteheads) if i < n_events]
