"""The tutorial notebooks are the reference's de-facto integration tests
(SURVEY section 4); execute their code cells against the vendored assets so
they cannot silently rot."""

import json
import os

import pytest

NB_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tutorials")


def _run_notebook(name):
    path = os.path.join(NB_DIR, name)
    ns = {}
    with open(path) as fp:
        nb = json.load(fp)
    for i, cell in enumerate(nb["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        exec(compile(src, f"{name}:cell{i}", "exec"), ns)
    return ns


@pytest.mark.slow
def test_a2a_notebook_executes(tmp_path, monkeypatch):
    import numpy as np

    monkeypatch.chdir(tmp_path)  # notebooks save figures to the cwd
    ns = _run_notebook("Embedding_Tutorial_Audio_to_Audio.ipynb")
    dists = ns["dists"]
    diag = float(np.diag(dists).mean())
    offdiag = float(dists[~np.eye(len(dists), dtype=bool)].mean())
    # 2-frame-shifted excerpts of the same recording are near-identical in
    # the embedding space; unrelated positions are far
    assert diag < 0.1 and offdiag > 0.5


@pytest.mark.slow
def test_embedding_notebook_executes(tmp_path, monkeypatch):
    import numpy as np

    monkeypatch.chdir(tmp_path)  # notebooks save figures to the cwd
    ns = _run_notebook("Embedding_Tutorial.ipynb")
    dists = ns["dists"]
    am = np.argmin(dists, axis=0)
    corr = float(np.corrcoef(np.arange(dists.shape[1]), am)[0, 1])
    # the cross-modal best-match path follows time through the real
    # page/recording pair (reference-notebook behavior; ~0.994 measured)
    assert corr > 0.97
