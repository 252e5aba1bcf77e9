"""Stub Piece/Score/Performance object model generating deterministic
synthetic pieces with the same structure the real MSMD corpus has:
multi-page scores, 'staff' mungos with notehead inlinks, per-performance
spectrograms + note events, performance keys encoding tempo and synth."""

from __future__ import annotations

import hashlib

import numpy as np

from ..midi_parser import FPS

PAGE_H, PAGE_W = 360, 300
SYSTEMS_PER_PAGE = 2
N_PAGES = 2
NOTES_PER_SYSTEM = 8
SYNTHS = ["grand-piano-YDP-20160804", "ElectricPiano"]
TEMPI = [950, 1000, 1300]  # milli-tempo-ratio as encoded in the perf key


def _piece_traits(name: str) -> dict:
    """Ragged-corpus traits keyed by piece name (the shapes a real MSMD
    collection throws — VERDICT r3 #7):

      *Ragged*   -- pages with DIFFERING system counts (3 then 1)
      *NoAlign*  -- align_score_to_performance raises for tempo-950 perfs
      *Audio44k* -- no precomputed spectrogram; raw 44.1 kHz audio only
                    (exercises the loader's DSP + polyphase-resample
                    fallback)
    """
    return {
        "systems_per_page": ([3, 1] if "Ragged" in name
                             else [SYSTEMS_PER_PAGE] * N_PAGES),
        "broken_align_tempi": ({"tempo-950"} if "NoAlign" in name
                               else set()),
        "audio_only_sr": 44100 if "Audio44k" in name else None,
    }


class Mungo:
    def __init__(self, objid, clsname, bounding_box, middle, inlinks=()):
        self.objid = objid
        self.clsname = clsname
        self.bounding_box = tuple(bounding_box)  # (top, left, bottom, right)
        self.top = bounding_box[0]
        self.middle = tuple(middle)  # (cy, cx)
        self.inlinks = list(inlinks)


def _seed_for(root: str, name: str) -> int:
    h = hashlib.sha256(f"{root}/{name}".encode()).digest()
    return int.from_bytes(h[:4], "little")


class Score:
    def __init__(self, piece: "Piece"):
        self.piece = piece
        self._build()

    def _build(self):
        rng = np.random.default_rng(_seed_for(self.piece.root, self.piece.name))
        traits = _piece_traits(self.piece.name)
        self._images = []
        self._mungos_per_page = []
        objid = 0
        for n_sys in traits["systems_per_page"]:
            img = np.full((PAGE_H, PAGE_W), 255, dtype=np.uint8)
            page_mungos = []
            spacing = (PAGE_H - 80) // max(1, n_sys)
            for s in range(n_sys):
                top = 40 + s * spacing
                bbox = (top, 20, top + 40, PAGE_W - 20)
                # draw 5 staff lines
                for li in range(5):
                    img[top + li * 10, 20:PAGE_W - 20] = 0
                note_ids = []
                xs = np.linspace(35, PAGE_W - 35, NOTES_PER_SYSTEM)
                xs = xs + rng.integers(-4, 5, size=len(xs))
                staff_id = objid
                objid += 1
                for x in xs:
                    nid = objid
                    objid += 1
                    cy = top + 20 + int(rng.integers(-8, 9))
                    img[max(cy - 2, 0):cy + 2, int(x) - 2:int(x) + 2] = 0
                    page_mungos.append(Mungo(
                        nid, "notehead-full",
                        (cy - 3, int(x) - 3, cy + 3, int(x) + 3),
                        (cy, float(x))))
                    note_ids.append(nid)
                page_mungos.insert(
                    len(page_mungos) - len(note_ids),
                    Mungo(staff_id, "staff", bbox,
                          ((bbox[0] + bbox[2]) / 2, PAGE_W / 2),
                          inlinks=note_ids))
            self._images.append(img)
            self._mungos_per_page.append(page_mungos)

    def load_mungos(self, by_page: bool = False):
        if by_page:
            return [list(p) for p in self._mungos_per_page]
        return [m for p in self._mungos_per_page for m in p]

    def load_images(self):
        return [img.copy() for img in self._images]


class Performance:
    def __init__(self, piece: "Piece", key: str, tempo: float, synth: str):
        self.piece = piece
        self.key = key
        traits = _piece_traits(piece.name)
        self._audio_only_sr = traits["audio_only_sr"]
        n_notes = sum(traits["systems_per_page"]) * NOTES_PER_SYSTEM
        rng = np.random.default_rng(
            _seed_for(piece.root, piece.name) ^ _seed_for("perf", key))
        # one event per notehead, onsets spaced by 0.4s scaled by tempo
        onsets = np.arange(n_notes) * (0.4 / tempo)
        pitches = rng.integers(40, 90, size=n_notes)
        durations = np.full(n_notes, 0.3 / tempo)
        self._events = np.stack(
            [onsets, pitches.astype(float), durations], axis=1)
        n_frames = int(np.ceil(onsets[-1] * FPS)) + 50
        self._spec = (rng.random((92, n_frames)) * 3.0).astype(np.float32)

    def load_note_events(self):
        return self._events.copy()

    def load_spectrogram(self):
        if self._audio_only_sr is not None:
            raise IOError(
                f"{self.key}: no precomputed spectrogram feature")
        return self._spec.copy()

    def load_audio(self):
        """(int16 signal, sample_rate) -- only for *Audio44k* pieces, at a
        NON-22050 rate so consumers must resample."""
        assert self._audio_only_sr is not None
        sr = self._audio_only_sr
        dur = float(self._events[-1, 0]) + 2.0
        t = np.arange(int(dur * sr)) / sr
        sig = np.zeros_like(t)
        for onset, pitch, d in self._events:
            f0 = 440.0 * 2 ** ((pitch - 69) / 12)
            m = (t >= onset) & (t < onset + d)
            sig[m] += 0.2 * np.sin(2 * np.pi * f0 * t[m])
        return (sig * 20000).astype(np.int16), sr

    def load_midi_matrix(self):
        n_frames = self._spec.shape[1]
        midi = np.zeros((128, n_frames), dtype=np.float32)
        for onset, pitch, dur in self._events:
            f0 = int(np.ceil(onset * FPS))
            f1 = min(n_frames, f0 + max(1, int(dur * FPS)))
            midi[int(pitch), f0:f1] = 1.0
        return midi


class Piece:
    def __init__(self, root: str, name: str):
        self.root = root
        self.name = name
        self.available_scores = [name]
        self.available_performances = [
            f"{name}_tempo-{t}_{s}" for t in TEMPI for s in SYNTHS
        ]

    def load_score(self, score_name: str) -> Score:
        assert score_name == self.name
        return Score(self)

    def load_performance(self, key: str,
                         require_audio: bool = True) -> Performance:
        assert key in self.available_performances, key
        tempo = float(key.split("tempo-")[1].split("_", 1)[0]) / 1000
        synth = key.split("tempo-")[1].split("_", 1)[1]
        return Performance(self, key, tempo, synth)
